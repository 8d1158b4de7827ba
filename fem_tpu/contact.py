# coding=utf-8
"""Body-body penalty contact (extension; VERDICT r3 #9 — no reference
counterpart).

The reference's bodies never interact: its main loop steps each object
independently and they share only the static obstacles (/root/reference
main.py:59-61 just loops objects), so multi-body scenes like
``demo_two_bodies`` interpenetrate freely.  ``contact="penalty"`` adds a
standard particle-particle penalty force between DIFFERENT bodies:

    f(i∈A, j∈B) = k · max(0, r_c − ‖x_i − x_j‖) · (x_i − x_j)/‖x_i − x_j‖

applied every substep, explicitly coupled (forces enter the explicit
kinematic update directly; the implicit solve folds them into its rhs via
``substep(external_force=...)``).  Newton's third law holds by construction
— body B receives exactly the opposite pair forces — so the contact
conserves linear momentum up to float reassociation (pinned by
tests/test_contact.py).

TPU mapping: the pair distances are ONE MXU matmul per body pair
(‖a‖² + ‖b‖² − 2·a·bᵀ over (N_a, N_b)) plus two small matmuls for the force
accumulation — dense, static-shaped, no neighbor lists.  For the framework's
2D/3D multi-body demo scales (10²-10⁴ particles per body) this is far below
one element-prep in cost; very large body pairs would want a culling
extension.

Extensions layered on the same pair machinery (all static-shaped MXU
matmuls, all antisymmetric ⇒ momentum-conserving):

- **Surface-vertex contact** (``contact_surface_only``, default on):
  pairs range over each body's surface-vertex set (the faces' vertices) —
  the standard FEM contact discretization (contact constraints live on the
  boundary), at O(surface²) instead of O(N²) pair cost.  All-pairs
  (``False``) is kept as a fallback; the two agree while penetration stays
  shallower than the first interior vertex layer minus the radius
  (tests/test_contact.py pins this), and differ only in how deep overlaps
  are penalized.
- **Self-contact** (``self_contact``): penalty pairs between surface
  vertices of ONE body whose REST distance exceeds 2.5·radius — the rest
  shape exerts exactly zero self-force; folding distant surface regions
  together repels them.
- **Viscous friction** (``contact_friction``): per active pair a dashpot
  on the full relative velocity, f_i −= c·Σ_j w_ij (v_i − v_j) with
  w_ij = overlap/radius, c = contact_friction·√(k·m_min) (≈ pair critical
  damping at contact_friction ~ 1).  Isotropic (damps normal approach and
  tangential slip alike), not Coulomb.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from fem_tpu.models.state import FemObject, Obstacles, SimState
from fem_tpu.sim import StepAux, _cfg_kwargs, substep
from fem_tpu.utils.config import SimConfig

_HP = jax.lax.Precision.HIGHEST


def auto_contact_radius(objs: Sequence[FemObject]) -> float:
    """Default contact radius: the mean rest edge length over all bodies —
    particles closer than one typical element edge of a FOREIGN body are
    treated as touching."""
    total, count = 0.0, 0
    for o in objs:
        pos = np.asarray(o.rest_pos)
        idx = np.asarray(o.element_indices)
        d = pos.shape[1]
        for j in range(1, d + 1):
            e = np.linalg.norm(pos[idx[:, j]] - pos[idx[:, 0]], axis=1)
            total += float(e.sum())
            count += e.size
    return total / max(count, 1)


def auto_contact_stiffness(objs: Sequence[FemObject], dt: float) -> float:
    """Default penalty stiffness at the explicit stability limit: a particle
    under q simultaneous pair springs must keep dt²·q·k/m ≪ 1.  With
    q ≈ 16 active foreign neighbors and a safety factor this is
    k = 0.02·m_min/dt² — stiff enough that equilibrium penetration under
    body weight is ≪ contact radius, soft enough that the penalty springs
    never set the stable dt."""
    m_min = min(float(np.asarray(o.mass).min()) for o in objs)
    return 0.02 * m_min / (dt * dt)


def _pair_coefs(pos_a, pos_b, radius, stiffness):
    """Pairwise distances → (penalty coefficient, overlap ramp) matrices."""
    sq_a = jnp.sum(pos_a * pos_a, axis=1)
    sq_b = jnp.sum(pos_b * pos_b, axis=1)
    cross = jnp.dot(pos_a, pos_b.T, precision=_HP)
    d2 = jnp.maximum(sq_a[:, None] + sq_b[None, :] - 2.0 * cross, 1e-18)
    dist = jnp.sqrt(d2)
    pen = jnp.maximum(radius - dist, 0.0)
    # Force magnitude / distance; the normalization distance is floored at
    # 0.1·radius so near-coincident foreign particles get a large-but-
    # bounded push instead of a singular one.
    coef = stiffness * pen / jnp.maximum(dist, 0.1 * radius)
    return coef, pen / radius


def _pair_mu_forces(
    pos_a, pos_b, vel_a, vel_b, radius, stiffness,
    friction_c, mu, mu_slope, mask=None,
):
    """Dense pair forces with EXPLICIT per-pair (ns_a, ns_b, d) tensors —
    the Coulomb tangential projection needs per-pair direction vectors,
    which the matmul trick in :func:`pair_contact_forces` never forms.
    Semantics match broadphase.grid_contact_forces exactly: direct
    coordinate differences (no ‖a‖²+‖b‖²−2ab cancellation), penalty
    coefficient k·pen/max(dist, 0.1r), optional isotropic dashpot, and
    the regularized Coulomb cone min(mu_slope·|v_t|, μ·k·pen)·v̂_t.
    d× the matmul path's HBM transients (still ~10× faster than the
    gather-bound grid while it fits — BASELINE.md broad-phase table).
    ``mask`` (0/1, zero diagonal) enables the same-body variant.
    Returns (f_a, f_b); antisymmetric per pair ⇒ momentum-conserving."""
    diff = pos_a[:, None, :] - pos_b[None, :, :]  # (ns_a, ns_b, d)
    d2 = jnp.sum(diff * diff, axis=-1)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-18))
    pen = jnp.maximum(radius - dist, 0.0)
    if mask is not None:
        pen = pen * mask  # also zeroes the dist≈0 diagonal
    coef = stiffness * pen / jnp.maximum(dist, 0.1 * radius)
    f_pair = coef[..., None] * diff
    dv = vel_a[:, None, :] - vel_b[None, :, :]
    if friction_c > 0.0:
        f_pair = f_pair - friction_c * (pen / radius)[..., None] * dv
    active = pen > 0.0
    n_hat = diff / dist[..., None]
    v_t = dv - jnp.sum(dv * n_hat, axis=-1, keepdims=True) * n_hat
    t_speed = jnp.sqrt(jnp.maximum(jnp.sum(v_t * v_t, axis=-1), 1e-24))
    f_t_mag = jnp.minimum(mu_slope * t_speed, mu * stiffness * pen)
    f_t_mag = jnp.where(active, f_t_mag, 0.0)
    f_pair = f_pair - (f_t_mag / t_speed)[..., None] * v_t
    return jnp.sum(f_pair, axis=1), -jnp.sum(f_pair, axis=0)


def pair_contact_forces(
    pos_a: jnp.ndarray,
    pos_b: jnp.ndarray,
    radius: float,
    stiffness: float,
    vel_a: Optional[jnp.ndarray] = None,
    vel_b: Optional[jnp.ndarray] = None,
    friction_c: float = 0.0,
    mu: float = 0.0,
    mu_slope: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Penalty forces (f_a, f_b) between two particle sets; f_b is the exact
    opposite scatter of the same pair forces.  With ``friction_c`` > 0 and
    velocities given, adds the viscous pair dashpot
    f_i −= c·Σ_j w_ij (v_i − v_j) (w = overlap ramp) — still antisymmetric.
    ``mu`` > 0 (Coulomb — needs velocities) routes to the explicit
    per-pair-tensor variant :func:`_pair_mu_forces`."""
    if mu > 0.0 and vel_a is not None:
        return _pair_mu_forces(
            pos_a, pos_b, vel_a, vel_b, radius, stiffness,
            friction_c, mu, mu_slope,
        )
    coef, w = _pair_coefs(pos_a, pos_b, radius, stiffness)
    row = jnp.sum(coef, axis=1)
    col = jnp.sum(coef, axis=0)
    f_a = pos_a * row[:, None] - jnp.dot(coef, pos_b, precision=_HP)
    f_b = pos_b * col[:, None] - jnp.dot(coef.T, pos_a, precision=_HP)
    if friction_c > 0.0 and vel_a is not None:
        cw = friction_c * w
        rw = jnp.sum(cw, axis=1)
        cwc = jnp.sum(cw, axis=0)
        f_a = f_a - (vel_a * rw[:, None] - jnp.dot(cw, vel_b, precision=_HP))
        f_b = f_b - (vel_b * cwc[:, None] - jnp.dot(cw.T, vel_a, precision=_HP))
    return f_a, f_b


def self_contact_forces(
    pos: jnp.ndarray,
    mask: jnp.ndarray,
    radius: float,
    stiffness: float,
    vel: Optional[jnp.ndarray] = None,
    friction_c: float = 0.0,
    mu: float = 0.0,
    mu_slope: float = 0.0,
) -> jnp.ndarray:
    """Same-body penalty forces between particles whose pairs are enabled by
    the static ``mask`` (0/1, symmetric, zero diagonal — rest-proximity
    exclusion built by :func:`build_contact_plan`).  Σᵢ fᵢ = 0 exactly in
    exact arithmetic because the masked coefficient matrix is symmetric.
    ``mu`` > 0 routes to the explicit per-pair-tensor Coulomb variant
    (per-pair force is antisymmetric and the mask symmetric, so summing
    the i-side over j double-counts nothing)."""
    if mu > 0.0 and vel is not None:
        f_a, _ = _pair_mu_forces(
            pos, pos, vel, vel, radius, stiffness,
            friction_c, mu, mu_slope, mask=mask,
        )
        # Each unordered pair (i, j) appears in BOTH row i and row j of
        # the full (symmetric-mask) pair tensor, so the i-side row sum
        # alone gives every particle its force — matching the matmul
        # path's Σ_j coef_ij (x_i − x_j).
        return f_a
    coef, w = _pair_coefs(pos, pos, radius, stiffness)
    coef = coef * mask
    f = pos * jnp.sum(coef, axis=1)[:, None] - jnp.dot(
        coef, pos, precision=_HP
    )
    if friction_c > 0.0 and vel is not None:
        cw = friction_c * (w * mask)
        f = f - (
            vel * jnp.sum(cw, axis=1)[:, None]
            - jnp.dot(cw, vel, precision=_HP)
        )
    return f


@struct.dataclass
class ContactPlan:
    """Static (per-scene) contact index data, passed as a jit ARGUMENT —
    never closed over (captured arrays compile as XLA constants, measured
    far slower on this backend; see CLAUDE.md)."""

    # Per-body (ns_i,) int32 participating-vertex ids (the surface-vertex
    # set when contact_surface_only, else arange(N)).
    surf: Tuple[jnp.ndarray, ...]
    # Per-body (ns_i, ns_i) f32 0/1 self-pair masks, or None when
    # self_contact is off (dense mode only).
    self_mask: Tuple[Optional[jnp.ndarray], ...]
    # Grid broad-phase fields (mode="grid", fem_tpu/broadphase.py) —
    # concatenated vertex soup over all bodies.  None in dense mode.
    body_id: Optional[jnp.ndarray] = None  # (Σns,) int32
    rest_cat: Optional[jnp.ndarray] = None  # (Σns, d)
    # Static routing fields.
    mode: str = struct.field(pytree_node=False, default="dense")
    sizes: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    self_contact: bool = struct.field(pytree_node=False, default=False)
    cap: int = struct.field(pytree_node=False, default=8)


def build_contact_plan(
    objs: Sequence[FemObject], cfg: SimConfig, radius: float
) -> ContactPlan:
    """Host-side plan build: surface-vertex sets from each body's faces,
    plus either the dense rest-distance self-pair masks or the grid
    broad-phase soup.

    ``contact_broadphase="auto"`` encodes the MEASURED TPU crossover
    (tools/probe_broadphase.py → BASELINE.md): the dense O(ns²) pair
    matrices ride the MXU/HBM stream and beat the gather-bound grid
    ~10-25× at every size that fits (65k vertices: dense 30 ms vs grid
    718 ms; dense still runs 98k = 9 GiB pair matrix in 75 ms), and
    dense only dies at the HBM wall (131k fails to compile, 16 GiB).  So
    auto picks the grid exactly when dense is structurally out:
    (a) more than 8 bodies (dense unrolls O(B²) pair matmuls at trace
    time), or (b) the pair transients would blow HBM — the largest
    single pair matrix over ~8 GiB, or with ``contact_mu`` > 0 (which
    needs EXPLICIT (ns_a, ns_b, d) pair tensors, d× the matmul path's
    transients and several live at once) over ~1 GiB per tensor."""
    surf, masks = [], []
    for o in objs:
        n = o.particle_cnt
        if cfg.contact_surface_only:
            sv = np.unique(np.asarray(o.faces).reshape(-1)).astype(np.int32)
        else:
            sv = np.arange(n, dtype=np.int32)
        surf.append(sv)
    mode = cfg.contact_broadphase
    if mode == "auto":
        sizes = [int(s.size) for s in surf]
        peak = max(
            [a * b for i, a in enumerate(sizes) for b in sizes[i + 1:]]
            + ([s * s for s in sizes] if cfg.self_contact else [0])
        )
        dim = objs[0].dim
        pair_budget = (
            2**30 // (4 * dim) if cfg.contact_mu > 0.0 else 2 * 2**30
        )
        mode = (
            "grid"
            if (len(surf) > 8 or peak > pair_budget)
            else "dense"
        )
    if mode not in ("dense", "grid"):
        raise ValueError(
            f"unknown contact_broadphase {cfg.contact_broadphase!r}"
        )
    if mode == "grid":
        from fem_tpu.broadphase import grid_shape

        grid_shape(radius, objs[0].dim)  # int32 range guard, loud at build
        body_id = np.concatenate([
            np.full(s.size, i, np.int32) for i, s in enumerate(surf)
        ])
        rest_cat = np.concatenate([
            np.asarray(o.rest_pos)[s] for o, s in zip(objs, surf)
        ])
        return ContactPlan(
            surf=tuple(jnp.asarray(s) for s in surf),
            self_mask=tuple(None for _ in surf),
            body_id=jnp.asarray(body_id),
            rest_cat=jnp.asarray(rest_cat),
            mode="grid",
            sizes=tuple(int(s.size) for s in surf),
            self_contact=bool(cfg.self_contact),
            cap=int(cfg.contact_cell_cap),
        )
    for o, sv in zip(objs, surf):
        if cfg.self_contact:
            rp = np.asarray(o.rest_pos)[sv]
            d = np.sqrt(
                np.maximum(
                    (rp ** 2).sum(1)[:, None]
                    + (rp ** 2).sum(1)[None, :]
                    - 2.0 * rp @ rp.T,
                    0.0,
                )
            )
            masks.append(jnp.asarray((d > 2.5 * radius).astype(np.float32)))
        else:
            masks.append(None)
    return ContactPlan(
        surf=tuple(jnp.asarray(s) for s in surf),
        self_mask=tuple(masks),
        sizes=tuple(int(s.size) for s in surf),
        self_contact=bool(cfg.self_contact),
    )


def contact_forces_all(
    positions: Sequence[jnp.ndarray],
    radius: float,
    stiffness: float,
    velocities: Optional[Sequence[jnp.ndarray]] = None,
    plan: Optional[ContactPlan] = None,
    friction_c: float = 0.0,
    mu: float = 0.0,
    mu_slope: float = 0.0,
) -> list:
    """Sum pair forces over every unordered body pair plus per-body
    self-contact (bodies are few; the pair loop unrolls at trace time).
    With a plan, pair work runs on each body's participating-vertex subset
    and scatters back into full-width force arrays."""
    n = len(positions)
    if plan is None:
        sub_pos = list(positions)
        sub_vel = list(velocities) if velocities is not None else [None] * n
    else:
        sub_pos = [p[sv] for p, sv in zip(positions, plan.surf)]
        sub_vel = (
            [v[sv] for v, sv in zip(velocities, plan.surf)]
            if velocities is not None
            else [None] * n
        )
    if plan is not None and plan.mode == "grid":
        # Uniform-grid broad phase (fem_tpu/broadphase.py): one pass over
        # the concatenated vertex soup covers every body pair AND
        # self-contact — O(ns·3^d·cap) instead of O(ns²).
        from fem_tpu.broadphase import grid_contact_forces

        pos_cat = jnp.concatenate(sub_pos, axis=0)
        vel_cat = (
            jnp.concatenate(sub_vel, axis=0)
            if velocities is not None
            else None
        )
        f_cat = grid_contact_forces(
            pos_cat, plan.body_id, plan.rest_cat, radius, stiffness,
            vel=vel_cat, friction_c=friction_c, cap=plan.cap,
            self_contact=plan.self_contact, mu=mu, mu_slope=mu_slope,
        )
        out, off = [], 0
        for p, sv, ns in zip(positions, plan.surf, plan.sizes):
            out.append(
                jnp.zeros_like(p).at[sv].add(f_cat[off:off + ns])
            )
            off += ns
        return out
    sub_f = [jnp.zeros_like(p) for p in sub_pos]
    for i in range(n):
        for j in range(i + 1, n):
            f_i, f_j = pair_contact_forces(
                sub_pos[i], sub_pos[j], radius, stiffness,
                sub_vel[i], sub_vel[j], friction_c, mu, mu_slope,
            )
            sub_f[i] = sub_f[i] + f_i
            sub_f[j] = sub_f[j] + f_j
    if plan is not None:
        for i in range(n):
            if plan.self_mask[i] is not None:
                sub_f[i] = sub_f[i] + self_contact_forces(
                    sub_pos[i], plan.self_mask[i], radius, stiffness,
                    sub_vel[i], friction_c, mu, mu_slope,
                )
    if plan is None:
        return sub_f
    return [
        jnp.zeros_like(p).at[sv].add(f)
        for p, sv, f in zip(positions, plan.surf, sub_f)
    ]


def make_contact_frame_fn(objs: Sequence[FemObject], cfg: SimConfig):
    """Jitted frame advancing ALL bodies jointly for ``sim_count`` substeps
    with per-substep penalty coupling.  Returns
    ``frame(states, obstacles) -> (states, aux_list)`` where ``states`` is a
    tuple of per-body SimStates and ``aux_list`` a per-body StepAux (stacked
    over substeps, matching make_frame_fn's contract)."""
    kwargs = _cfg_kwargs(cfg)
    radius = (
        cfg.contact_radius
        if cfg.contact_radius > 0.0
        else auto_contact_radius(objs)
    )
    stiffness = (
        cfg.contact_stiffness
        if cfg.contact_stiffness > 0.0
        else auto_contact_stiffness(objs, cfg.delta_time)
    )
    m_min = min(float(np.asarray(o.mass).min()) for o in objs)
    friction_c = cfg.contact_friction * float(np.sqrt(stiffness * m_min))
    mu = cfg.contact_mu
    mu_slope = float(np.sqrt(stiffness * m_min))  # pair critical damping
    plan = build_contact_plan(objs, cfg, radius)
    objs = tuple(objs)

    @jax.jit
    def frame_impl(
        os_: Tuple[FemObject, ...], plan_: ContactPlan, states,
        obstacles: Obstacles,
    ):
        def body(ss, _):
            forces = contact_forces_all(
                [s.pos for s in ss], radius, stiffness,
                velocities=[s.vel for s in ss], plan=plan_,
                friction_c=friction_c, mu=mu, mu_slope=mu_slope,
            )
            out, auxes = [], []
            for o, s, f in zip(os_, ss, forces):
                s2, aux = substep(o, s, obstacles, external_force=f, **kwargs)
                out.append(s2)
                auxes.append(aux)
            return tuple(out), tuple(auxes)

        return jax.lax.scan(body, tuple(states), None, length=cfg.sim_count)

    def frame(states, obstacles: Obstacles):
        return frame_impl(objs, plan, states, obstacles)

    return frame
