# coding=utf-8
"""Harmonic response + modal transient (solvers/harmonic.py) — framework
extension, no reference counterpart (the reference is time-domain only).

The superposition math is pinned against a dense complex direct solve
(K − ω²M + iωC)x̂ = F̂ using the FULL modal basis (exact equality up to
f32), and the exact propagator against closed-form damped-oscillator
solutions including the singular rigid-mode (ω = 0) case."""

import numpy as np
import jax.numpy as jnp
import scipy.linalg as sla

from fem_tpu.models.mesh import construct_2d_mesh
from fem_tpu.models.state import build_object
from fem_tpu.solvers.harmonic import (
    HarmonicResult,
    harmonic_response,
    modal_transient,
    project_field,
    reconstruct_field,
)
from fem_tpu.solvers.modal import ModalResult, make_stiffness_hvp
from fem_tpu.utils.config import ObjectConfig


def _pinned_object(subdivisions=3):
    cfg = ObjectConfig(
        center=(0.5, 0.5), side_length=0.2, subdivisions=subdivisions,
        pin_boxes=(((0.0, 0.695), (1.0, 1.0)),),
    )
    v, f, e = construct_2d_mesh(cfg)
    obj, state = build_object(cfg, v, f, e)
    assert obj.free_mask is not None
    return obj, state


def _dense_system(obj, pos):
    """Dense free-DOF K (from the same HVP) and lumped M."""
    kv = make_stiffness_hvp(obj, pos)
    n, d = pos.shape
    nd = n * d
    K = np.zeros((nd, nd))
    for i in range(nd):
        e = np.zeros(nd, np.float32)
        e[i] = 1.0
        K[:, i] = np.asarray(kv(jnp.asarray(e.reshape(n, d)))).reshape(nd)
    free = np.repeat(np.asarray(obj.free_mask)[:, 0], d).astype(bool)
    K = 0.5 * (K + K.T)[np.ix_(free, free)]
    M = np.repeat(np.asarray(obj.mass), d)[free]
    return K, M, free


def _full_modal_result(obj, pos):
    """Exact full modal basis from the dense f64 oracle, packed as a
    ModalResult (isolates the harmonic/transient math from the eigensolver)."""
    K, M, free = _dense_system(obj, pos)
    w2, V = sla.eigh(K, np.diag(M))  # V is M-orthonormal
    n, d = pos.shape
    k = w2.shape[0]
    modes = np.zeros((k, n * d), np.float32)
    modes[:, free] = V.T.astype(np.float32)
    omega = np.sqrt(np.maximum(w2, 0.0))
    return (
        ModalResult(
            omega_sq=jnp.asarray(w2.astype(np.float32)),
            frequencies=jnp.asarray((omega / (2 * np.pi)).astype(np.float32)),
            modes=jnp.asarray(modes.reshape(k, n, d)),
            residuals=jnp.zeros((k,), jnp.float32),
        ),
        K, M, free,
    )


def test_harmonic_matches_dense_direct_solve():
    obj, state = _pinned_object()
    modal, K, M, free = _full_modal_result(obj, state.pos)
    n, d = state.pos.shape
    rng = np.random.default_rng(0)
    f_hat = rng.normal(size=(n, d)).astype(np.float32)
    f_hat *= np.asarray(obj.free_mask)
    alpha, beta = 3.0, 2e-4
    f1 = float(modal.frequencies[0])
    freqs = np.array([0.25 * f1, 0.9 * f1, f1, 2.3 * f1], np.float32)
    res = harmonic_response(modal, jnp.asarray(f_hat), jnp.asarray(freqs),
                            alpha=alpha, beta=beta)
    x_hat = reconstruct_field(modal, res.coeffs)  # (nf, N, d) complex
    for i, fq in enumerate(freqs):
        w = 2 * np.pi * fq
        Z = K - w**2 * np.diag(M) + 1j * w * (alpha * np.diag(M) + beta * K)
        x_direct = np.linalg.solve(Z, f_hat.reshape(-1)[free])
        got = np.asarray(x_hat[i]).reshape(-1)[free]
        np.testing.assert_allclose(got, x_direct, rtol=0, atol=2e-4 * np.abs(x_direct).max())
    # amplitude/phase fields agree with the complex reconstruction
    np.testing.assert_allclose(
        np.asarray(res.amplitude), np.abs(np.asarray(x_hat)), rtol=1e-5
    )


def test_harmonic_resonance_peak_and_phase():
    obj, state = _pinned_object()
    modal, _, _, _ = _full_modal_result(obj, state.pos)
    n, d = state.pos.shape
    # Load shaped like the first mode → dominated by it.
    f_hat = np.asarray(modal.modes[0]) * np.asarray(obj.mass)[:, None]
    f1 = float(modal.frequencies[0])
    freqs = jnp.asarray(np.linspace(0.5 * f1, 1.5 * f1, 41, dtype=np.float32))
    res = harmonic_response(modal, jnp.asarray(f_hat), freqs, zeta=0.02)
    amp = np.asarray(jnp.abs(res.coeffs[:, 0]))
    peak = int(np.argmax(amp))
    assert abs(float(res.freqs[peak]) - f1) < 0.03 * f1
    # Phase of the resonant modal coordinate crosses −90° at ω = ω₁.
    at_res = int(np.argmin(np.abs(np.asarray(freqs) - f1)))
    ph = float(jnp.angle(res.coeffs[at_res, 0]))
    assert abs(ph + np.pi / 2) < 0.15


def test_harmonic_fields_flag_and_reconstruct():
    obj, state = _pinned_object()
    modal, _, _, _ = _full_modal_result(obj, state.pos)
    f_hat = jnp.asarray(
        np.random.default_rng(1).normal(size=state.pos.shape).astype(np.float32)
    )
    freqs = jnp.asarray([5.0, 25.0], dtype=jnp.float32)
    lite = harmonic_response(modal, f_hat, freqs, beta=1e-4, fields=False)
    assert lite.amplitude is None and lite.phase is None
    full = harmonic_response(modal, f_hat, freqs, beta=1e-4)
    np.testing.assert_allclose(
        np.abs(np.asarray(reconstruct_field(modal, lite.coeffs))),
        np.asarray(full.amplitude), rtol=1e-6,
    )


def _toy_modal(omega_sq):
    """k analytic single-DOF 'modes' (mesh-free) for propagator tests."""
    k = len(omega_sq)
    modes = np.zeros((k, k, 1), np.float32)
    for i in range(k):
        modes[i, i, 0] = 1.0  # unit mass ⇒ M-orthonormal
    w2 = np.asarray(omega_sq, np.float32)
    return ModalResult(
        omega_sq=jnp.asarray(w2),
        frequencies=jnp.asarray(np.sqrt(np.maximum(w2, 0)) / (2 * np.pi)),
        modes=jnp.asarray(modes),
        residuals=jnp.zeros((k,), jnp.float32),
    )


def test_modal_transient_matches_damped_oscillator_closed_form():
    w = 7.0
    zeta = 0.15
    modal = _toy_modal([w * w])
    dt, steps = 0.01, 300
    res = modal_transient(
        modal, dt, steps, q0=jnp.asarray([1.0]), zeta=jnp.asarray([zeta])
    )
    t = np.asarray(res.times)
    wd = w * np.sqrt(1 - zeta**2)
    exact = np.exp(-zeta * w * t) * (
        np.cos(wd * t) + (zeta * w / wd) * np.sin(wd * t)
    )
    np.testing.assert_allclose(np.asarray(res.q[:, 0]), exact, atol=2e-5)


def test_modal_transient_rigid_mode_constant_force():
    """ω = 0 (singular companion A): q(t) = p·t²/2 exactly — exercises the
    augmented-exponential forced step."""
    modal = _toy_modal([0.0, 25.0])
    p = np.zeros((2, 1), np.float32)
    p[0, 0] = 3.0  # constant force on the rigid mode
    dt, steps = 0.02, 50
    res = modal_transient(modal, dt, steps, f_const=jnp.asarray(p))
    t = np.asarray(res.times)
    np.testing.assert_allclose(
        np.asarray(res.q[:, 0]), 3.0 * t**2 / 2.0, rtol=1e-5, atol=1e-6
    )
    # The elastic mode under the same (zero) load stays at rest.
    assert np.abs(np.asarray(res.q[:, 1])).max() < 1e-7


def test_modal_transient_settles_to_static_and_projection_roundtrip():
    obj, state = _pinned_object()
    modal, _, M, free = _full_modal_result(obj, state.pos)
    n, d = state.pos.shape
    rng = np.random.default_rng(2)
    f_hat = (rng.normal(size=(n, d)) * np.asarray(obj.free_mask)).astype(
        np.float32
    )
    # Heavily damped transient under constant load → static modal solution
    # qᵢ = pᵢ/ωᵢ².
    res = modal_transient(
        modal, dt=0.01, steps=4000, f_const=jnp.asarray(f_hat),
        zeta=jnp.full((modal.omega_sq.shape[0],), 0.7),
    )
    p = np.einsum("knd,nd->k", np.asarray(modal.modes), f_hat)
    q_static = p / np.asarray(modal.omega_sq)
    np.testing.assert_allclose(
        np.asarray(res.q[-1]), q_static, rtol=5e-3,
        atol=1e-5 * np.abs(q_static).max(),
    )
    # project_field inverts reconstruction on the modal subspace.
    x = np.real(np.asarray(reconstruct_field(modal, jnp.asarray(q_static))))
    q_back = project_field(modal, obj.mass, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(q_back), q_static, rtol=2e-3,
        atol=1e-5 * np.abs(q_static).max(),
    )


def test_participation_factors_capture_total_mass():
    """With the FULL modal basis the effective modal masses must sum to
    the total unpinned mass in any direction (completeness); a truncated
    basis captures strictly less."""
    from fem_tpu.solvers.harmonic import participation_factors

    obj, state = _pinned_object()
    modal, _, _, free = _full_modal_result(obj, state.pos)
    n, d = state.pos.shape
    m = np.asarray(obj.mass)
    free_v = np.asarray(obj.free_mask)[:, 0].astype(bool)
    for direction in ((1.0, 0.0), (0.0, 1.0), (0.6, 0.8)):
        res = participation_factors(modal, obj.mass, jnp.asarray(direction))
        # Total mass of FREE vertices along a unit direction.
        e = np.asarray(direction) / np.linalg.norm(direction)
        m_free = float(np.sum(m[free_v] * np.sum(e * e)))
        np.testing.assert_allclose(
            float(jnp.sum(res.effective_mass)), m_free, rtol=1e-4
        )
    # Truncation monotonicity: first 4 modes capture less than all.
    res_all = participation_factors(modal, obj.mass, jnp.asarray((0.0, 1.0)))
    from fem_tpu.solvers.modal import ModalResult

    trunc = ModalResult(
        omega_sq=modal.omega_sq[:4], frequencies=modal.frequencies[:4],
        modes=modal.modes[:4], residuals=modal.residuals[:4],
    )
    res_4 = participation_factors(trunc, obj.mass, jnp.asarray((0.0, 1.0)))
    assert float(jnp.sum(res_4.effective_mass)) < float(
        jnp.sum(res_all.effective_mass)
    )
