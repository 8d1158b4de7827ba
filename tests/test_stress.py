# coding=utf-8
"""Stress-field post-processing (ops/element.cauchy_stress — extension; the
reference renders only the energy density and exposes no stress).

Validation: analytic anchors (zero at rest, uniaxial von Mises identity,
hydrostatic von Mises zero), objectivity σ(RF) = R·σ·Rᵀ for the finite-strain
materials, symmetry for the isotropic hyperelastic models, and end-to-end
agreement of the stress of a statically solved uniform stretch with the
closed-form P(F̄)·F̄ᵀ/J.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fem_tpu.ops.element import (
    cauchy_stress,
    element_stresses,
    first_piola,
    von_mises,
)
from fem_tpu.ops import smallmat as sm

MU, LAM = 1.5e4, 2.3e4
FINITE = ["neo_hookean", "stvk", "corotated", "stable_neo_hookean"]
ALL = FINITE + ["linear"]


def _rot(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    k = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * k @ k


@pytest.mark.parametrize("material", ALL)
def test_zero_at_rest(material):
    F = jnp.eye(3)[None]
    sig = cauchy_stress(F, MU, LAM, material)
    np.testing.assert_allclose(np.asarray(sig), 0.0, atol=1e-4)


def test_von_mises_uniaxial_identity():
    s = 123.0
    sig = jnp.asarray(np.diag([s, 0.0, 0.0])[None])
    np.testing.assert_allclose(float(von_mises(sig)[0]), s, rtol=1e-6)


def test_von_mises_hydrostatic_zero():
    sig = jnp.asarray((42.0 * np.eye(3))[None])
    np.testing.assert_allclose(float(von_mises(sig)[0]), 0.0, atol=1e-3)


@pytest.mark.parametrize("material", FINITE)
def test_objectivity(material):
    rng = np.random.default_rng(0)
    F = np.eye(3) + 0.1 * rng.standard_normal((3, 3))
    R = _rot([1.0, 2.0, 0.5], 0.7)
    sig = np.asarray(cauchy_stress(jnp.asarray(F[None], jnp.float32), MU, LAM,
                                   material))[0]
    sig_rot = np.asarray(
        cauchy_stress(jnp.asarray((R @ F)[None], jnp.float32), MU, LAM,
                      material)
    )[0]
    np.testing.assert_allclose(
        sig_rot, R @ sig @ R.T, rtol=2e-3, atol=np.abs(sig).max() * 5e-3
    )


@pytest.mark.parametrize("material", FINITE)
def test_symmetry(material):
    rng = np.random.default_rng(1)
    F = np.eye(3) + 0.15 * rng.standard_normal((5, 3, 3))
    sig = np.asarray(cauchy_stress(jnp.asarray(F, jnp.float32), MU, LAM,
                                   material))
    np.testing.assert_allclose(
        sig, np.swapaxes(sig, -1, -2), atol=np.abs(sig).max() * 1e-5
    )


def test_static_stretch_stress_matches_closed_form():
    """Patch-style end-to-end: statically solve a surface-pinned affine
    stretch and check every element's Cauchy stress equals P(F̄)·F̄ᵀ/det F̄."""
    from fem_tpu.solvers.static import solve_static
    from tests.test_static import surface_pinned_grid

    obj, state, boundary = surface_pinned_grid(material="neo_hookean")
    x_rest = np.asarray(state.pos, np.float64)
    f_bar = np.diag([1.08, 0.96, 1.01])
    target = x_rest @ f_bar.T
    pos0 = np.where(boundary[:, None], target, x_rest).astype(np.float32)
    res = solve_static(obj, jnp.asarray(pos0), tol=1e-4)
    assert bool(res.converged) or bool(res.stalled)
    sig = np.asarray(
        element_stresses(
            res.pos, obj.element_indices, obj.ref_inv,
            obj.mu, obj.s_lambda, obj.material,
        )
    )
    P = np.asarray(
        first_piola(jnp.asarray(f_bar[None], jnp.float32), obj.mu,
                    obj.s_lambda, "neo_hookean")
    )[0]
    expected = P @ f_bar.T / np.linalg.det(f_bar)
    scale = np.abs(expected).max()
    np.testing.assert_allclose(
        sig, np.broadcast_to(expected, sig.shape), atol=5e-3 * scale
    )
    # and the field is homogeneous (per-element spread ~ f32 noise)
    assert sig.std(axis=0).max() < 2e-3 * scale


def test_simulation_api_and_render_modes():
    from fem_tpu.api import Simulation

    sim = Simulation.from_dict(
        {
            "dim": 2,
            "use_explicit_method": True,
            "objects": [{"center": [0.4, 0.5], "subdivisions": 4}],
        }
    )
    sim.run(frames=2)
    sig = sim.stress()
    vm = sim.von_mises()
    assert sig.shape == (sim.scene[0].obj.element_cnt, 2, 2)
    assert vm.shape == (sim.scene[0].obj.element_cnt,)
    assert np.all(np.isfinite(sig)) and np.all(vm >= 0.0)
    img_e = sim.render()
    img_s = sim.render(color="stress")
    assert img_e.shape == img_s.shape == (640, 640, 3)
    assert not np.array_equal(img_e, img_s)  # tints differ under load
