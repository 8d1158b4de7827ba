# coding=utf-8
"""Arc-length continuation (solvers/riks.py) — framework extension, no
reference counterpart.  The canonical validation: snap-through of a
shallow arch, whose equilibrium path has a limit point (fold) that load
control cannot cross — the tracer must record the DESCENDING-λ segment
and land on the inverted branch, with every recorded point a true
equilibrium of its own λ."""

import numpy as np
import jax.numpy as jnp
import pytest

from fem_tpu.models.state import build_object
from fem_tpu.solvers.riks import arc_length_path
from fem_tpu.utils.config import ObjectConfig


def _arch_object(nx=48, ny=2, span=1.0, t=0.012, rise=0.06):
    """Shallow sine arch: strip mesh bent to y += rise·sin(πx/L), both
    ends pinned (clamped)."""
    xs = np.linspace(0.0, span, nx + 1)
    ys = np.linspace(0.0, t, ny + 1)
    v = np.array(np.meshgrid(xs, ys)).T.reshape(-1, 2).astype(np.float32)
    v[:, 1] += (rise * np.sin(np.pi * v[:, 0] / span)).astype(np.float32)
    faces = []
    for i in range(nx):
        for j in range(ny):
            p1 = i * (ny + 1) + j
            p2 = p1 + 1
            p3 = p1 + ny + 1
            p4 = p3 + 1
            faces.append([p1, p2, p4])
            faces.append([p1, p4, p3])
    faces = np.array(faces, np.int32)
    eps = span / nx / 4.0
    cfg = ObjectConfig(
        center=(0.0, 0.0),
        pin_boxes=(
            ((-1.0, -1.0), (eps, 1.0)),
            ((span - eps, -1.0), (span + 1.0, 1.0)),
        ),
    )
    obj, state = build_object(cfg, v, faces, faces.copy())
    pos = np.asarray(state.pos)
    crown = np.where(np.abs(pos[:, 0] - span / 2.0) < span / nx * 0.6)[0]
    return obj, state, crown


def test_riks_snap_through_shallow_arch():
    """Slenderness matters: the fold exists only for thin arches — the
    measured sweep (session record): t=0.012/rise=0.06 folds at λ≈2.0
    and dips to ≈1.36, while the CST-overstiff t=0.03 arch is fold-free
    (pure membrane stiffening).  The default geometry is the folding one."""
    obj, state, crown = _arch_object()
    pos = np.asarray(state.pos)
    rise = 0.06
    f = np.zeros_like(pos)
    f[crown, 1] = -1.0 / len(crown)

    # Scale the unit load so λ is O(1) at the fold: normalize the initial
    # tangent's crown deflection to ~0.10·rise per unit λ (direct solve).
    from fem_tpu.solvers.riks import _SparseTangent

    dx_lin = _SparseTangent(obj).factor(state.pos)(
        np.asarray(f, np.float64)
    )
    crown_per_lam = float(np.mean(dx_lin[crown, 1]))
    scale = 0.10 * rise / max(abs(crown_per_lam), 1e-12)
    f_scaled = jnp.asarray(f * scale)

    res = arc_length_path(
        obj, state.pos, f_scaled, n_steps=30, dlam0=0.3, tol=1e-6,
        record_path=False,
    )
    lam = np.asarray(res.lam)
    ctrl = np.asarray(res.control)  # crown-y displacement (downward < 0)
    assert res.steps_taken >= 15

    # 1. The crown snapped through: final deflection far past the rise.
    assert ctrl[-1] < -1.5 * rise

    # 2. λ is NON-monotone: during the snap (crown below −rise) the path
    #    carries a load BELOW the limit value reached before it — the fold
    #    segment no load-controlled solver can produce.
    mid = np.where(ctrl < -rise)[0]
    assert mid.size > 0
    i_mid = int(mid[0])
    lam_limit = lam[:i_mid].max()
    assert lam[i_mid] < 0.95 * lam_limit
    assert lam_limit > 0

    # 3. Every recorded point is a true equilibrium of its own λ (to the
    #    f32 assembly floor the solver reports).
    assert res.tol_used > 0
    assert np.all(np.asarray(res.residuals)[1:] <= res.tol_used * 1.001)

    # 4. Re-stiffening: the inverted branch carries rising load again.
    assert lam[-1] > lam[i_mid]


def test_riks_requires_pins():
    from tests.utils import make_2d_object

    _, obj, state = make_2d_object(subdivisions=3)
    with pytest.raises(ValueError, match="Dirichlet"):
        arc_length_path(obj, state.pos, jnp.zeros_like(state.pos))


def test_riks_fold_cross_validates_linear_buckling():
    """The linearized buckling factor (solvers/buckling.py) is the classic
    UPPER estimate of a limit point when the pre-buckling path softens:
    measured 2.33 (buckling) vs 2.01 (true fold) on the test arch — the
    two independent analyses must bracket within ~50%."""
    from fem_tpu.solvers.buckling import linear_buckling
    from fem_tpu.solvers.riks import _SparseTangent

    obj, state, crown = _arch_object()
    pos = np.asarray(state.pos)
    rise = 0.06
    f = np.zeros_like(pos)
    f[crown, 1] = -1.0 / len(crown)
    dx_lin = _SparseTangent(obj).factor(state.pos)(np.asarray(f, np.float64))
    scale = 0.10 * rise / abs(float(np.mean(dx_lin[crown, 1])))
    fs = jnp.asarray(f * scale)

    res = arc_length_path(obj, state.pos, fs, n_steps=30, dlam0=0.3,
                          record_path=False)
    lam = np.asarray(res.lam)
    ctrl = np.asarray(res.control)
    fold = lam[: int(np.where(ctrl < -rise)[0][0])].max()

    bk = linear_buckling(obj, state.pos, f_ext=fs, k=2, rounds=20)
    factor = float(bk.load_factors[0])
    assert fold > 0 and np.isfinite(factor)
    assert 1.0 <= factor / fold <= 1.5
