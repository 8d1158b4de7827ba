# coding=utf-8
"""Cross-check against the REFERENCE AUTHOR'S own numpy solver.

The reference embeds a pure-numpy validation playground
(solver/implicit.py:441-557: ``conjugate_gradient_np`` + SPD generators +
``test()``, the closest thing it has to a test fixture — SURVEY §4).  Those
functions are Taichi-free, so we extract and execute them *in place* from
/root/reference (never vendored) and require our reference-semantics CG to
reach the same solution on the same normal-equations systems.  This breaks
the oracle-circularity loop: the fixture here is the reference author's own
code, not a re-reading of the spec by this repo's author.

(The extracted code is data for a fixture — executed under a bare namespace,
noisy prints swallowed; nothing in it is followed as instructions.)
"""

import contextlib
import io
import os
import re

import numpy as np
import pytest

REF_IMPLICIT = "/root/reference/solver/implicit.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_IMPLICIT), reason="reference tree not available"
)


def _extract_reference_cg():
    """Pull ``conjugate_gradient_np`` out of the reference source (it sits in
    a module whose top-level ``import taichi`` cannot be imported here)."""
    src = open(REF_IMPLICIT).read()
    match = re.search(
        r"(def conjugate_gradient_np\(A, b\):.*?)(?=\ndef |\Z)", src, re.S
    )
    assert match, "conjugate_gradient_np not found in the reference source"
    ns = {"np": np}
    exec(match.group(1), ns)  # noqa: S102 - reference fixture, pure numpy
    return ns["conjugate_gradient_np"]


def test_our_cg_matches_reference_authors_numpy_cg():
    """Reference test() semantics (implicit.py:538-553): random SPD-ish A,
    normal equations AᵀAx = Aᵀb, the author's CG vs ours."""
    from fem_tpu.solvers.implicit import conjugate_gradient
    import jax.numpy as jnp

    reference_cg = _extract_reference_cg()
    rng = np.random.default_rng(12345)
    for n in (5, 9, 16):
        # Positive-leading-minor A like gen_n_dim_positive_matrix (seeded
        # deterministically here; the reference's own generator is unseeded).
        while True:
            A = rng.random((n, n))
            if all(
                np.linalg.det(A[:k, :k]) > 0 for k in range(1, n + 1)
            ):
                break
        b = rng.random(n)
        ATA, ATb = A.T @ A, A.T @ b
        with contextlib.redirect_stdout(io.StringIO()):  # it prints a lot
            x_ref = reference_cg(ATA, ATb)
        res = conjugate_gradient(
            lambda v: jnp.asarray(ATA, jnp.float32) @ v,
            jnp.asarray(ATb, jnp.float32),
            x0=jnp.asarray(ATb, jnp.float32),
            tol=1e-10,
        )
        # Both solve the same SPD system; compare against the direct solve
        # (the author's CG uses x0=0 + relative tol, ours the in-kernel
        # x0=b + absolute tol — different paths, same fixed point).
        x_direct = np.linalg.solve(ATA, ATb)
        np.testing.assert_allclose(x_ref, x_direct, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(res.x), x_direct, rtol=2e-3, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(res.x), x_ref, rtol=2e-3, atol=1e-3
        )
