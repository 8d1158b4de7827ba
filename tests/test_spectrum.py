# coding=utf-8
"""Response-spectrum analysis (solvers/spectrum.py) — framework extension,
no reference counterpart (the reference at /root/reference is a time-domain
simulator only).

The SDOF spectrum scan is pinned against the closed-form steady-state
amplitude of a damped oscillator under sinusoidal base acceleration and
against the rigid-oscillator limit (pseudo-Sa → peak ground acceleration);
the modal combinations are cross-validated against the TRUE time-history
peak of the same ground motion integrated with modal_transient on the full
modal basis — abssum must bound it, srss/cqc must land near it."""

import numpy as np
import jax.numpy as jnp

from fem_tpu.solvers.harmonic import modal_transient
from fem_tpu.solvers.spectrum import (
    cqc_correlation,
    response_spectrum,
    response_spectrum_analysis,
)
from tests.test_harmonic import _full_modal_result, _pinned_object


def test_sdof_spectrum_matches_f64_ode_oracle():
    """Sinusoidal base acceleration A·sin(ω_g t), damped oscillators: the
    spectrum scan must match an independent f64 ``solve_ivp`` integration
    of q̈ + 2ζωq̇ + ω²q = −ü_g tracking max|q| (the spectrum includes the
    startup transient, which EXCEEDS the steady-state amplitude off
    resonance — the steady-state value is only a lower bound); at
    resonance the transient approaches from below, so the closed form
    A/(2ζωω_g) is exact there."""
    from scipy.integrate import solve_ivp

    amp, w_g, zeta, dt = 2.0, 5.0, 0.1, 1e-3
    t = np.arange(int(25.0 / dt)) * dt  # ζω ≥ 0.4 → transient long dead
    accel = (amp * np.sin(w_g * t)).astype(np.float32)
    omegas = jnp.asarray([4.0, 5.0, 8.0, 12.0], jnp.float32)
    res = response_spectrum(jnp.asarray(accel), dt, omegas, zeta=zeta)
    w = np.asarray(omegas, np.float64)

    def oracle(wi):
        sol = solve_ivp(
            lambda tt, y: [
                y[1],
                -amp * np.sin(w_g * tt)
                - 2 * zeta * wi * y[1]
                - wi * wi * y[0],
            ],
            (0.0, 25.0), [0.0, 0.0], rtol=1e-9, atol=1e-12,
            t_eval=np.arange(0, 25.0, 2e-4),
        )
        return np.abs(sol.y[0]).max()

    expected = np.array([oracle(wi) for wi in w])
    np.testing.assert_allclose(np.asarray(res.sd), expected, rtol=1e-2)
    # Steady state is a lower bound everywhere and exact at resonance.
    steady = amp / np.sqrt(
        (w**2 - w_g**2) ** 2 + (2 * zeta * w * w_g) ** 2
    )
    assert (np.asarray(res.sd) >= steady * (1 - 1e-2)).all()
    np.testing.assert_allclose(float(res.sd[1]), steady[1], rtol=1e-2)
    # Pseudo-quantities are definitional.
    np.testing.assert_allclose(
        np.asarray(res.sa), np.asarray(res.sd) * w**2, rtol=1e-6
    )


def test_sdof_spectrum_rigid_limit_recovers_pga():
    """A very stiff oscillator rides the ground rigidly: Sd → PGA/ω², i.e.
    pseudo-acceleration → the peak ground acceleration."""
    dt = 2e-4
    t = np.arange(int(6.0 / dt)) * dt
    accel = (1.5 * np.sin(4.0 * t) + 0.8 * np.sin(9.0 * t)).astype(
        np.float32
    )
    pga = float(np.abs(accel).max())
    res = response_spectrum(
        jnp.asarray(accel), dt, jnp.asarray([300.0]), zeta=0.05
    )
    np.testing.assert_allclose(float(res.sa[0]), pga, rtol=5e-2)


def test_cqc_correlation_properties():
    omegas = jnp.asarray([3.0, 3.05, 10.0, 40.0])
    zeta = jnp.full((4,), 0.05)
    rho = np.asarray(cqc_correlation(omegas, zeta))
    np.testing.assert_allclose(np.diag(rho), 1.0, atol=1e-6)
    np.testing.assert_allclose(rho, rho.T, atol=1e-6)
    assert rho[0, 1] > 0.9  # nearly coincident modes are ~fully correlated
    assert rho[0, 2] < 0.05 and rho[2, 3] < 0.05  # separated ≈ independent
    # ζ = 0: exact identity (CQC degenerates to SRSS).
    rho0 = np.asarray(cqc_correlation(omegas, jnp.zeros((4,))))
    np.testing.assert_allclose(rho0, np.eye(4), atol=1e-7)


def _ground_motion(dt=2e-3, dur=6.0):
    """BROADBAND deterministic record (30 log-spaced tones, random phases):
    the combination rules assume broadband excitation — a narrowband
    (single/two-tone) record makes modal peaks strongly correlated and
    SRSS genuinely inaccurate (measured 0.6-2.2× here before this was
    made broadband)."""
    t = np.arange(int(dur / dt)) * dt
    rng = np.random.default_rng(7)
    ws = np.geomspace(20.0, 400.0, 30)
    phases = rng.uniform(0, 2 * np.pi, ws.shape)
    amps = rng.uniform(0.5, 1.0, ws.shape)
    a = (amps[:, None] * np.sin(ws[:, None] * t[None, :]
                                + phases[:, None])).sum(0)
    a *= np.minimum(t / 0.5, 1.0)  # ramp-in, no step discontinuity
    return jnp.asarray(a.astype(np.float32)), dt


def test_combinations_bracket_true_time_history_peak():
    """Full cross-validation on a pinned 2D mesh with its FULL modal basis:
    the same ground motion drives (a) the response-spectrum pipeline and
    (b) an exact modal time-history (modal_transient with the identical
    sample-and-hold forcing).  abssum must bound the true per-DOF peak
    (rigorous inequality), srss ≤ abssum, and srss/cqc must land within
    30% of the true peak on the dominant DOFs."""
    obj, state = _pinned_object()
    modal, _, _, _ = _full_modal_result(obj, state.pos)
    accel, dt = _ground_motion()
    zeta = 0.05
    direction = jnp.asarray((1.0, 0.0))

    omegas = jnp.sqrt(jnp.maximum(modal.omega_sq, 0.0))
    sp = response_spectrum(accel, dt, omegas, zeta=zeta)
    results = {
        c: response_spectrum_analysis(
            modal, obj.mass, direction, spectrum=sp, zeta=zeta,
            combination=c,
        )
        for c in ("srss", "cqc", "abssum")
    }

    # True peak: integrate the reduced system under the SAME held samples.
    e_unit = direction / jnp.linalg.norm(direction)
    mass_e = obj.mass[:, None] * e_unit[None, :]

    def force(t):
        idx = jnp.clip(
            jnp.round(t / dt).astype(jnp.int32), 0, accel.shape[0] - 1
        )
        return -accel[idx] * mass_e

    tr = modal_transient(
        modal, dt, accel.shape[0], force=force, zeta=jnp.full(
            modal.omega_sq.shape, zeta
        ),
    )
    x_t = jnp.einsum("tk,knd->tnd", tr.q, modal.modes)
    true_peak = np.asarray(jnp.max(jnp.abs(x_t), axis=0))

    abssum = np.asarray(results["abssum"].peak)
    srss = np.asarray(results["srss"].peak)
    cqc = np.asarray(results["cqc"].peak)
    tiny = 1e-6 * true_peak.max()

    # Rigorous orderings.
    assert (true_peak <= abssum * (1 + 1e-3) + tiny).all()
    assert (srss <= abssum * (1 + 1e-3) + tiny).all()
    assert (cqc <= abssum * (1 + 1e-3) + tiny).all()

    # Accuracy on the DOFs that matter: every DOF within 10% of the global
    # peak must be estimated within 30% by srss AND cqc (textbook band for
    # broadband excitation).
    hot = true_peak > 0.1 * true_peak.max()
    for est in (srss, cqc):
        ratio = est[hot] / true_peak[hot]
        assert ratio.min() > 0.7 and ratio.max() < 1.3, ratio

    # Full basis captures all the free mass.
    assert float(results["srss"].captured) > 0.99 * float(
        np.asarray(obj.mass)[np.asarray(obj.free_mask)[:, 0] > 0].sum()
        / np.asarray(obj.mass).sum()
    )


def test_rigid_modes_rejected_and_arg_validation():
    import pytest

    obj, state = _pinned_object()
    modal, _, _, _ = _full_modal_result(obj, state.pos)
    accel, dt = _ground_motion(dur=0.1)
    sp = response_spectrum(
        accel, dt, jnp.sqrt(modal.omega_sq), zeta=0.05
    )
    # Exactly one of spectrum=/sd=.
    with pytest.raises(ValueError, match="exactly one"):
        response_spectrum_analysis(
            modal, obj.mass, (1.0, 0.0), spectrum=sp, sd=sp.sd
        )
    with pytest.raises(ValueError, match="exactly one"):
        response_spectrum_analysis(modal, obj.mass, (1.0, 0.0))
    # Unknown combination.
    with pytest.raises(ValueError, match="unknown combination"):
        response_spectrum_analysis(
            modal, obj.mass, (1.0, 0.0), spectrum=sp, combination="peak"
        )
    # Rigid modes (ω = 0) are rejected loudly.
    from fem_tpu.solvers.modal import ModalResult

    rigid = ModalResult(
        omega_sq=modal.omega_sq.at[0].set(0.0),
        frequencies=modal.frequencies,
        modes=modal.modes,
        residuals=modal.residuals,
    )
    with pytest.raises(ValueError, match="positive modal frequencies"):
        response_spectrum_analysis(
            rigid, obj.mass, (1.0, 0.0), spectrum=sp
        )
