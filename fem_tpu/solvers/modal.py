# coding=utf-8
"""Modal analysis: natural frequencies and vibration mode shapes.

Framework extension (the reference has no eigenanalysis of any kind) that
completes the structural-analysis toolkit next to the quasi-static solver
(solvers/static.py) and the stress fields (ops/element.py): solve the
generalized eigenproblem

    K φ = ω² M φ

at a configuration ``pos`` (usually the rest pose or a static equilibrium),
where K = −∂f/∂x is the exact material-generic elastic stiffness (the same
Hessian-vector product the exact-Newton implicit operator uses — never
materialized) and M is the reference's lumped diagonal mass.

TPU-native design: everything is matrix-free and MXU/VPU-friendly —

  * K·v via ``jax.jvp`` of the assembled analytic elastic force (O(E) per
    application, exact for every material incl. corotated through the polar);
  * the mass-symmetrized operator C = M^{−1/2} K M^{−1/2} keeps the problem
    *standard* symmetric, so φᵀMφ = I orthonormality falls out of the
    eigenvector orthogonality;
  * smallest-k eigenpairs via jax's accelerator-friendly blocked LOBPCG in
    shift-invert form: the operator handed to LOBPCG is (C + εI)⁻¹ applied
    matrix-free by an inner CG loop, so the target modes sit at the TOP of
    the spectrum with large *relative* gaps (a plain spectral shift σI − C
    leaves gaps of λᵢ₊₁−λᵢ over λmax — measured to stagnate in f32 beyond
    ~100 DOFs; the inverse spectrum's λᵢ₊₁/λᵢ ratios converge fast and stay
    f32-friendly for TPU execution);
  * Dirichlet pins (``pin_boxes``/``obj.free_mask``) enter as the standard
    projection: pinned DOFs are removed via C ← P·C·P and parked at σ so
    they sort after every physical mode.

Without pins the lowest ``d`` (+ rotational) modes are the rigid-body
motions at ω ≈ 0 — physical, reported as-is.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fem_tpu.models.state import FemObject
from fem_tpu.ops.assembly import assemble_for, element_contrib_full
from fem_tpu.solvers.implicit import _material_force_columns


class ModalResult(NamedTuple):
    """Eigenpairs sorted by ascending frequency.

    ``omega_sq``: (k,) eigenvalues ω² of K φ = ω² M φ (≥ 0 at a stable
    equilibrium; small negatives are roundoff and are clamped in ``omega``).
    ``frequencies``: (k,) natural frequencies f = ω / 2π in Hz.
    ``modes``: (k, N, dim) M-orthonormal mode shapes (φᵢᵀ M φⱼ = δᵢⱼ).
    ``residuals``: (k,) relative residuals ‖Kφ − ω²Mφ‖ / (‖Kφ‖ + ω²‖Mφ‖).
    """

    omega_sq: jnp.ndarray
    frequencies: jnp.ndarray
    modes: jnp.ndarray
    residuals: jnp.ndarray


def make_stiffness_hvp(obj: FemObject, pos: jnp.ndarray):
    """Exact elastic stiffness product v ↦ K·v = −(∂f/∂x)·v at ``pos``.

    The material-generic force is the assembled analytic Piola gradient
    (solvers/implicit._material_force_columns — reference implicit rhs
    semantics for NH, first_piola for the material extensions)."""

    def force(p: jnp.ndarray) -> jnp.ndarray:
        cols = _material_force_columns(obj, p, False)
        return assemble_for(obj, element_contrib_full(cols))

    def kv(v: jnp.ndarray) -> jnp.ndarray:
        _, df = jax.jvp(force, (pos,), (v,))
        return -df

    return kv


def modal_analysis(
    obj: FemObject,
    pos: jnp.ndarray,
    k: int = 6,
    m: int = 100,
    tol: Optional[float] = None,
    inner_iters: int = 400,
    eps_rel: float = 1e-4,
    seed: int = 0,
    chunk_m: Optional[int] = None,
) -> ModalResult:
    """Smallest-``k`` vibration modes of ``obj`` linearized at ``pos``.

    One jitted computation: power-iteration bound λmax, then blocked LOBPCG
    on the shift-inverted operator (Ĉ + εI)⁻¹ with Ĉ = P·C·P + λmax(I−P)
    (pinned DOFs parked at the top so their inverses sort last) and
    ε = ``eps_rel``·λmax.  Each LOBPCG step applies an inner CG solve of at
    most ``inner_iters`` iterations (matrix-free — k HVPs per CG step).
    ``k`` must satisfy LOBPCG's blocking constraint 5·k < N·dim (small
    meshes: reduce k).  ``chunk_m`` splits the LOBPCG into warm-restarted
    device programs of that many steps — required at large mesh sizes on
    relayed backends that kill long single programs."""
    n, d = pos.shape
    nd = n * d
    if 5 * k >= nd:
        raise ValueError(
            f"modal_analysis: 5*k={5 * k} must be < N*dim={nd} "
            "(LOBPCG blocking constraint) — reduce k or refine the mesh"
        )
    # Guard vectors: the trailing Ritz pairs of a block solve converge last,
    # so solve for k + q and return the first k (q trimmed to the blocking
    # constraint on tiny meshes).
    kq = k + max(2, k // 2)
    while 5 * kq >= nd and kq > k:
        kq -= 1
    kv = make_stiffness_hvp(obj, pos)
    inv_sqrt_m = (1.0 / jnp.sqrt(obj.mass))[:, None]  # (N, 1)
    free = obj.free_mask if obj.free_mask is not None else jnp.ones((n, 1))
    free = free.astype(pos.dtype)
    free_flat = jnp.repeat(free[:, 0], d)  # (nd,)

    def c_single(y: jnp.ndarray) -> jnp.ndarray:
        """C·y on one flat (N·d,) vector, pinned DOFs projected out."""
        v = (y.reshape(n, d) * inv_sqrt_m) * free
        w = kv(v) * free * inv_sqrt_m
        return w.reshape(nd)

    def make_inv_block(lam_max):
        eps = eps_rel * lam_max

        def op(y):
            # Ĉ + εI: SPD, pinned DOFs at λmax + ε (inverse sorts last).
            return (
                c_single(y * free_flat)
                + lam_max * (y - y * free_flat)
                + eps * y
            )

        op_block = jax.vmap(op, in_axes=1, out_axes=1)

        def inv_block(y_block):
            """(Ĉ + εI)⁻¹ · Y via blocked CG (all k columns together)."""
            x = jnp.zeros_like(y_block)
            r = y_block
            p = r
            rs = jnp.sum(r * r, axis=0)

            def body(_, carry):
                x, r, p, rs = carry
                ap = op_block(p)
                denom = jnp.sum(p * ap, axis=0)
                alpha = rs / jnp.where(denom > 0, denom, 1.0)
                x = x + alpha[None, :] * p
                r = r - alpha[None, :] * ap
                rs_new = jnp.sum(r * r, axis=0)
                beta = rs_new / jnp.where(rs > 0, rs, 1.0)
                p = r + beta[None, :] * p
                return x, r, p, rs_new

            x, _, _, _ = jax.lax.fori_loop(
                0, inner_iters, body, (x, r, p, rs)
            )
            return x

        return inv_block, eps

    @jax.jit
    def setup():
        key = jax.random.PRNGKey(seed)
        # λmax bound via power iteration on C (pinned DOFs contribute 0).
        v0 = jax.random.normal(key, (nd,), pos.dtype)

        def power_step(_, v):
            w = c_single(v)
            return w / (jnp.linalg.norm(w) + 1e-30)

        v_fin = jax.lax.fori_loop(0, 30, power_step, v0)
        lam_max = jnp.abs(jnp.vdot(v_fin, c_single(v_fin))) + 1.0
        x0 = jax.random.normal(
            jax.random.fold_in(key, 1), (nd, kq), pos.dtype
        )
        return lam_max, x0

    @functools.partial(jax.jit, static_argnames=("steps",))
    def run_chunk(lam_max, x0, steps):
        inv_block, _ = make_inv_block(lam_max)
        theta, u, _ = _lobpcg(inv_block, x0, steps, tol)
        return theta, u

    @jax.jit
    def finish(lam_max, theta, u):
        _, eps = make_inv_block(lam_max)
        lam = 1.0 / jnp.maximum(theta, 1e-30) - eps  # ascending smallest of Ĉ
        order = jnp.argsort(lam)[:k]
        lam = lam[order]
        u = u[:, order]
        # Back to physical mode shapes: φ = M^{-1/2} y (M-orthonormal).
        phi = (
            u.reshape(n, d, k) * inv_sqrt_m[..., None] * free[..., None]
        )
        # Residual check INSIDE the jit (k HVPs as one traced computation —
        # the eager per-op dispatch of the same loop at 68k tets reproducibly
        # crashed this environment's relayed TPU worker).
        mass_col = obj.mass[:, None]

        def one_res(p_i, lam_i):
            k_p = kv(p_i) * free
            m_p = mass_col * p_i
            num = jnp.linalg.norm(k_p - lam_i * m_p)
            den = (
                jnp.linalg.norm(k_p)
                + jnp.abs(lam_i) * jnp.linalg.norm(m_p)
            )
            return num / (den + 1e-30)

        res = jax.vmap(one_res, in_axes=(-1, 0))(phi, lam)
        return lam, phi, res

    lam_max, x = setup()
    # Host-chunked warm restarts: each chunk is one bounded device program
    # (chunk_m LOBPCG steps × inner_iters CG applies) re-seeded with the
    # previous chunk's Ritz vectors.  A single m×inner program at 68k tets
    # reproducibly crashed this environment's relayed TPU worker (the short
    # program survives — a long-single-program limit of the relay, not a
    # memory issue); chunking trades LOBPCG's conjugate directions at
    # restart boundaries for bounded program length.  chunk_m=None keeps
    # the single-program behavior.
    steps = m if chunk_m is None else min(chunk_m, m)
    done = 0
    theta = None
    while done < m:
        theta, x = run_chunk(lam_max, x, min(steps, m - done))
        done += steps
    lam, phi, res = finish(lam_max, theta, x)
    omega_sq = lam
    omega = jnp.sqrt(jnp.maximum(omega_sq, 0.0))
    return ModalResult(
        omega_sq=omega_sq,
        frequencies=omega / (2.0 * jnp.pi),
        modes=jnp.moveaxis(phi, -1, 0),
        residuals=res,
    )


def _lobpcg(a_block, x0, m, tol):
    from jax.experimental.sparse.linalg import lobpcg_standard

    theta, u, iters = lobpcg_standard(a_block, x0, m=m, tol=tol)
    return theta, u, iters


def modal_analysis_chebyshev(
    obj: FemObject,
    pos: jnp.ndarray,
    k: int = 6,
    rounds: int = 8,
    degree: int = 150,
    seed: int = 0,
    target_tol: float = 1e-3,
    x0_modes: Optional[jnp.ndarray] = None,
) -> ModalResult:
    """Smallest-``k`` modes via Chebyshev-filtered subspace iteration — the
    matrix-free method that *scales*.

    The shift-invert route (:func:`modal_analysis`) needs its inner CG to
    invert (C + εI); keeping the inverse spectrum's bottom gaps open needs
    ε ≲ λ₁, which drives the inner conditioning to λmax/λ₁ — measured at
    68k tets: λmax ≈ 1.6e7 vs λ₁ ≈ 9, so a well-gapped inverse would need
    thousands of CG iterations per application while the default ε = 1e-4
    λmax collapses every bottom gap to ~1e-3 and LOBPCG stalls at
    residual ~0.8 (BASELINE.md).  The Chebyshev filter needs NO inverse:
    each round applies p(C) = T_deg((2C − (a+b))/(b − a)) to the block by
    the three-term recurrence (``degree`` HVPs, with per-column rescaling
    against f32 overflow — T_deg at λ ≈ 0 reaches cosh(deg·acosh(e₀)) ≫
    f32 max), which amplifies [0, a] over [a, λmax] by an exponential
    factor — the f32 relative-gap problem disappears.  Then one QR
    orthonormalization + Rayleigh–Ritz on C (kq HVPs + a kq×kq eigh)
    extracts Ritz pairs, and the cutoff ``a`` is re-adapted from the Ritz
    values, so no spectral knowledge is required up front.  Each round is
    one bounded device program (long single programs crash this relayed
    backend — BASELINE.md).

    Pinned DOFs are parked at λmax by the same projection as the
    shift-invert route (the filter damps them maximally).  Converges when
    the max relative residual over the k wanted modes drops below
    ``target_tol``; always runs at least 3 rounds.

    ``x0_modes`` (k₀, N, d) warm-starts the subspace from previously
    computed physical mode shapes (converted back to symmetrized
    coordinates Y = M^{1/2}φ and padded with random guard columns) — the
    mechanism behind :func:`modal_refine_f64`.  All arithmetic follows
    ``pos.dtype``, so an f64 ``pos`` (under ``jax.enable_x64``) runs the
    whole filter in double precision.
    """
    n, d = pos.shape
    nd = n * d
    if 2 * k >= nd:
        raise ValueError(
            f"modal_analysis_chebyshev: need 2*k < N*dim, got {2 * k} vs {nd}"
        )
    kq = min(k + max(2, k // 2), nd // 2)
    kv = make_stiffness_hvp(obj, pos)
    inv_sqrt_m = (1.0 / jnp.sqrt(obj.mass))[:, None]
    free = obj.free_mask if obj.free_mask is not None else jnp.ones((n, 1))
    free = free.astype(pos.dtype)
    free_flat = jnp.repeat(free[:, 0], d)

    def c_single(y: jnp.ndarray) -> jnp.ndarray:
        v = (y.reshape(n, d) * inv_sqrt_m) * free
        w = kv(v) * free * inv_sqrt_m
        return w.reshape(nd)

    def c_parked(lam_max):
        def op(y):
            return c_single(y * free_flat) + lam_max * (y - y * free_flat)

        return jax.vmap(op, in_axes=1, out_axes=1)

    @jax.jit
    def setup():
        key = jax.random.PRNGKey(seed)
        v0 = jax.random.normal(key, (nd,), pos.dtype)

        def power_step(_, v):
            w = c_single(v)
            return w / (jnp.linalg.norm(w) + 1e-30)

        v_fin = jax.lax.fori_loop(0, 40, power_step, v0)
        lam_max = jnp.abs(jnp.vdot(v_fin, c_single(v_fin)))
        x0 = jax.random.normal(jax.random.fold_in(key, 1), (nd, kq), pos.dtype)
        if x0_modes is not None:
            # Symmetrized coordinates of the seed modes: Y = M^{1/2} φ.
            k0 = min(x0_modes.shape[0], kq)
            y = (
                x0_modes[:k0].astype(pos.dtype)
                * jnp.sqrt(obj.mass)[None, :, None]
            ).reshape(k0, nd).T
            x0 = x0.at[:, :k0].set(y)
        return lam_max * 1.05 + 1.0, x0

    @jax.jit
    def one_round(lam_max, a, x):
        cb = c_parked(lam_max)
        b = lam_max
        e = (b - a) / 2.0
        c0 = (b + a) / 2.0

        def cheb_step(_, carry):
            tj, tjm1 = carry
            tnext = (cb(tj) - c0 * tj) * (2.0 / e) - tjm1
            # Per-column rescale (same factor applied to both terms keeps
            # the recurrence exact in direction): T_deg at the bottom of
            # the spectrum overflows f32 long before deg ~ 100s otherwise.
            s = 1.0 / (jnp.max(jnp.abs(tnext), axis=0, keepdims=True) + 1e-30)
            return tnext * s, tj * s

        t1 = (cb(x) - c0 * x) / e
        y, _ = jax.lax.fori_loop(0, degree - 1, cheb_step, (t1, x))
        q, _ = jnp.linalg.qr(y)
        h = q.T @ cb(q)
        h = 0.5 * (h + h.T)
        theta, s = jnp.linalg.eigh(h)  # ascending
        x_new = q @ s
        cx = cb(x_new)
        # Relative residual with a λmax-scaled floor: rigid modes sit at
        # θ ≈ 0 where a pure |θ| denominator is meaningless noise.
        res = jnp.linalg.norm(
            cx - theta[None, :] * x_new, axis=0
        ) / jnp.maximum(jnp.abs(theta), 1e-7 * lam_max)
        # Next window: amplify everything up to just above the guard Ritz
        # value (never above the parked pins / mid-spectrum).
        a_next = jnp.clip(1.5 * theta[kq - 1], 1e-6 * lam_max, 0.5 * lam_max)
        return x_new, theta, res, a_next

    lam_max, x = setup()
    a = 1e-4 * lam_max
    theta = res = None
    for r in range(rounds):
        x, theta, res, a = one_round(lam_max, a, x)
        if r >= 2 and bool(jnp.max(res[:k]) < target_tol):
            break

    theta_k = theta[:k]
    phi = (
        x[:, :k].reshape(n, d, k) * inv_sqrt_m[..., None] * free[..., None]
    )
    omega = jnp.sqrt(jnp.maximum(theta_k, 0.0))
    return ModalResult(
        omega_sq=theta_k,
        frequencies=omega / (2.0 * jnp.pi),
        modes=jnp.moveaxis(phi, -1, 0),
        residuals=res[:k],
    )


def _cast_inexact(tree, dtype):
    """Cast every floating-point leaf of a pytree; leave integers alone.
    Leaves round-trip through host numpy so accelerator-committed arrays
    re-place on the ambient default device (the f64 refinement runs on
    CPU — an in-place astype on a TPU-committed leaf would ask the TPU
    for f64)."""

    def leaf(a):
        h = np.asarray(a)
        return jnp.asarray(
            h, dtype if np.issubdtype(h.dtype, np.inexact) else None
        )

    return jax.tree_util.tree_map(leaf, tree)


def modal_residuals_f64(
    obj: FemObject, pos: jnp.ndarray, result: ModalResult
) -> ModalResult:
    """Direct f64-accumulated residuals of an f32 modal solve (VERDICT r4
    #6 — the round-5 'f64-accumulating HVP' seed).

    The f32 route's RAW residuals measure the f32 HVP's noise floor
    (~ε₃₂·λmax of spectral contamination per application), not the computed
    subspace's quality.  This pass re-EVALUATES the f32 mode shapes exactly
    as computed — weights (mesh arrays, positions, modes) are the f32
    values cast to f64, every accumulation runs in double on the host CPU —
    so the reported residual is a direct, noise-free measurement of the f32
    subspace: ``λᵢ = φᵢᵀKφᵢ/φᵢᵀMφᵢ`` (f64 Rayleigh quotient of the f32
    vector) and ``rᵢ = ‖P(Kφᵢ − λᵢMφᵢ)‖ / (‖Kφᵢ‖ + λᵢ‖Mφᵢ‖)``.  Unlike
    :func:`modal_refine_f64` it does NOT improve the modes — it turns the
    cross-method-agreement accuracy claim into a direct residual claim.
    Cost: k f64 HVPs."""
    with jax.enable_x64(True):
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            obj64 = _cast_inexact(obj, jnp.float64)
            pos64 = jax.device_put(
                jnp.asarray(np.asarray(pos), jnp.float64), cpu
            )
            phi = jax.device_put(
                jnp.asarray(np.asarray(result.modes), jnp.float64), cpu
            )  # (k, N, d)
            kv = make_stiffness_hvp(obj64, pos64)
            mass = obj64.mass[:, None]
            free = obj64.free_mask  # (N, 1) f64 or None

            def one(phi_i):
                p_i = phi_i if free is None else free * phi_i
                k_phi = kv(p_i)
                if free is not None:
                    k_phi = free * k_phi
                m_phi = mass * p_i
                lam = jnp.sum(p_i * k_phi) / jnp.sum(p_i * m_phi)
                r = k_phi - lam * m_phi
                nrm = jnp.linalg.norm(r.reshape(-1)) / (
                    jnp.linalg.norm(k_phi.reshape(-1))
                    + jnp.abs(lam) * jnp.linalg.norm(m_phi.reshape(-1))
                )
                return lam, nrm

            lams, resids = jax.vmap(one)(phi)
            omega_sq = lams
            return ModalResult(
                omega_sq=omega_sq,
                frequencies=jnp.sqrt(jnp.maximum(omega_sq, 0.0))
                / (2.0 * jnp.pi),
                modes=phi,
                residuals=resids,
            )


def modal_refine_f64(
    obj: FemObject,
    pos: jnp.ndarray,
    result: Optional[ModalResult] = None,
    k: int = 6,
    rounds: int = 2,
    degree: int = 120,
    seed: int = 0,
    target_tol: float = 1e-10,
) -> ModalResult:
    """Float64 refinement of an f32 modal solve — the tight-claim path.

    At high stiffness contrast the f32 route's RAW residuals sit at the
    f32 HVP-noise floor, not at the subspace's true accuracy: each f32
    HVP injects ~ε₃₂·λmax of spectral contamination into the block, so at
    cond(K) ~ 2e6 (measured at 68k tets — BASELINE.md) the reported
    relative residuals plateau around 1e-3·λmax/λᵢ-ish noise while the
    eigenvalues themselves cross-validate to ~0.1%.  This pass re-runs
    :func:`modal_analysis_chebyshev` in DOUBLE precision on the host CPU
    (TPUs have no native f64), seeded with the f32 mode shapes — the f64
    filter scrubs the f32 contamination exponentially in ``degree``, and
    the final f64 Rayleigh–Ritz reports residuals at the true subspace
    accuracy (≤1e-8 observed on CI meshes; tests/test_modal.py pins it
    against an f64-assembled dense oracle).

    ``result`` = the f32 ModalResult to refine (None = cold-start the f64
    filter from random, costlier).  Runs under ``jax.enable_x64`` on the
    CPU backend regardless of the ambient platform; returns f64 arrays.
    Cost: (rounds·degree + O(k)) f64 HVPs of the (cast-to-f64) assembled
    force — host-sized work, intended for offline verification rather
    than the hot path."""
    with jax.enable_x64(True):
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            obj64 = _cast_inexact(obj, jnp.float64)
            pos64 = jax.device_put(
                jnp.asarray(np.asarray(pos), jnp.float64), cpu
            )
            x0 = (
                jax.device_put(
                    jnp.asarray(np.asarray(result.modes), jnp.float64), cpu
                )
                if result is not None
                else None
            )
            return modal_analysis_chebyshev(
                obj64, pos64, k=k, rounds=rounds, degree=degree,
                seed=seed, target_tol=target_tol, x0_modes=x0,
            )


def modal_analysis_sparse_f64(
    obj: FemObject, pos: jnp.ndarray, k: int = 6
) -> ModalResult:
    """Direct f64 sparse shift-invert modal solve on the host — the
    tight-claim oracle at ANY conditioning (VERDICT r4 #6 closure).

    The Chebyshev f64 refinement (:func:`modal_refine_f64`) scrubs f32
    contamination only as fast as the filter separates the spectrum: at
    cond(K) ≈ 2e6 (68k tets) 2×120 degrees left direct residuals ~0.1
    (measured, BASELINE.md).  This path sidesteps iteration entirely —
    exact f64 per-element Hessians (``jax.hessian`` of the local element
    energy, the Riks tangent machinery, solvers/riks.py:108), sparse
    assembly restricted to free DOFs, and ARPACK generalized shift-invert
    (``scipy.sparse.linalg.eigsh``, σ at/below the spectrum bottom) — so
    residuals come out at f64 factorization accuracy (~1e-10 at 68k) and
    the TPU f32 route's eigenvalues can be validated against a DIRECT
    measurement rather than cross-method agreement.  Host-only
    (direct sparse factorization has no TPU story); cost ≈ one f64
    element-Hessian sweep + one sparse LU + ARPACK iterations."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from fem_tpu.solvers.riks import make_element_hessian_fn

    d = int(pos.shape[-1])
    n = int(obj.particle_cnt)
    with jax.enable_x64(True):
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            obj64 = _cast_inexact(obj, jnp.float64)
            pos64 = jax.device_put(
                jnp.asarray(np.asarray(pos), jnp.float64), cpu
            )
            h = np.asarray(
                make_element_hessian_fn(obj64)(pos64), np.float64
            )  # (E, m, m), m = (d+1)·d
    elem = np.asarray(obj.element_indices)
    m = (d + 1) * d
    gdof = (elem[:, :, None] * d + np.arange(d)[None, None, :]).reshape(-1, m)
    rows = np.repeat(gdof, m, axis=1).ravel()
    cols = np.tile(gdof, (1, m)).ravel()
    k_full = sp.coo_matrix(
        (h.ravel(), (rows, cols)), shape=(n * d, n * d)
    ).tocsr()
    mass = np.repeat(np.asarray(obj.mass, np.float64), d)
    free = (
        np.repeat(np.asarray(obj.free_mask)[:, 0].astype(bool), d)
        if obj.free_mask is not None
        else np.ones(n * d, bool)
    )
    kf = k_full[free][:, free]
    mf = mass[free]
    m_op = sp.diags(mf).tocsc()
    # σ = 0 needs K SPD (pinned bodies); a free body has rigid modes at 0 —
    # shift just below the spectrum so K − σM stays definite either way.
    sigma = 0.0 if obj.free_mask is not None else -1e-3
    w, v = spla.eigsh(kf, k=k, M=m_op, sigma=sigma, which="LM")
    order = np.argsort(w)
    w, v = w[order], v[:, order]
    # Direct residuals against the assembled f64 operator.
    kv = kf @ v
    mv = mf[:, None] * v
    resid = np.linalg.norm(kv - w[None, :] * mv, axis=0) / (
        np.linalg.norm(kv, axis=0)
        + np.abs(w) * np.linalg.norm(mv, axis=0)
    )
    modes = np.zeros((k, n * d))
    modes[:, free] = v.T
    # M-normalize (eigsh returns M-orthonormal already; keep it explicit).
    nrm = np.sqrt(np.einsum("ki,i,ki->k", modes, mass, modes))
    modes = modes / nrm[:, None]
    with jax.enable_x64(True):  # keep the oracle's arrays in f64
        return ModalResult(
            omega_sq=jnp.asarray(w, jnp.float64),
            frequencies=jnp.asarray(
                np.sqrt(np.maximum(w, 0.0)) / (2 * np.pi), jnp.float64
            ),
            modes=jnp.asarray(modes.reshape(k, n, d), jnp.float64),
            residuals=jnp.asarray(resid, jnp.float64),
        )
