# coding=utf-8
"""Inverse plasticity: recover the von-Mises yield strain from a trajectory.

A capability with no reference counterpart twice over: the reference has
neither plasticity nor through-time autodiff.  Here the whole rollout —
layered elastic forces on the effective rest state, the kinematic update,
AND the radial return map advancing ``F_p⁻¹`` — is one pure JAX function
(fem_tpu/diff.py with ``DiffParams.plastic_yield`` traced; the round-5
componentwise Jacobi return map is piecewise smooth, so gradients flow
through yielding).

Protocol: squash a plastic block anisotropically past yield, let it flow
and spring back for N substeps at the TRUE yield strain ε_y*, record the
trajectory.  Then start from a 2× wrong guess and descend a trajectory-
mismatch loss.  The permanent set is a monotone fingerprint of ε_y (lower
yield → more flow → squatter rebound), so the loss is well-conditioned.

Run:  python examples/inverse_yield.py
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import optax

from fem_tpu.diff import DiffParams, make_diff_rollout_fn
from fem_tpu.models.mesh import construct_2d_mesh
from fem_tpu.models.state import Obstacles, build_object
from fem_tpu.utils.config import ObjectConfig, SimConfig

FAST = os.environ.get("FEM_TPU_EXAMPLE_FAST") == "1"

Y_TRUE = 0.05
Y_GUESS = 0.10  # start at twice the true yield strain
N_SUBSTEPS = 8 if FAST else 30
N_ITERS = 3 if FAST else 80

ocfg = ObjectConfig(center=(0.5, 0.5), side_length=0.2,
                    subdivisions=4 if FAST else 6,
                    E=4e4, nu=0.25, damping=20.0, plastic_yield=Y_TRUE)
cfg = SimConfig(
    dim=2, auto_diff=False, use_explicit_method=True,
    g_dir=(0.0, 0.0), objects=(ocfg,), blocks=(),
)
vertices, faces, elements = construct_2d_mesh(ocfg)
obj, state0 = build_object(ocfg, vertices, faces, elements)
obstacles = Obstacles.from_configs((), 2)

# Anisotropic squash well past yield — the flow distance depends on ε_y.
pos = state0.pos
c = pos.mean(axis=0, keepdims=True)
state0 = state0.replace(
    pos=c + (pos - c) * jnp.asarray([1.3, 0.72], jnp.float32)[None, :]
)

rollout = make_diff_rollout_fn(obj, cfg, N_SUBSTEPS)
base = DiffParams(
    jnp.float32(obj.mu), jnp.float32(obj.s_lambda),
    jnp.float32(obj.damping), plastic_yield=jnp.float32(Y_TRUE),
)
_, traj_true = rollout(base, state0, obstacles)


def loss_fn(log_y):
    params = base._replace(plastic_yield=jnp.exp(log_y))
    _, traj = rollout(params, state0, obstacles)
    return jnp.mean((traj - traj_true) ** 2) * 1e4


def main():
    log_y = jnp.log(jnp.float32(Y_GUESS))
    opt = optax.adam(5e-2)
    opt_state = opt.init(log_y)
    vg = jax.jit(jax.value_and_grad(loss_fn))
    for i in range(N_ITERS):
        val, g = vg(log_y)
        upd, opt_state = opt.update(g, opt_state)
        log_y = optax.apply_updates(log_y, upd)
        if i % 10 == 0 or i == N_ITERS - 1:
            print(f"iter {i:3d}: loss {float(val):.3e} "
                  f"yield {float(jnp.exp(log_y)):.4f} (true {Y_TRUE})")
    y_hat = float(jnp.exp(log_y))
    err = abs(y_hat - Y_TRUE) / Y_TRUE
    print(f"recovered yield strain {y_hat:.4f} vs true {Y_TRUE} "
          f"({err * 100:.1f}% error)")
    if not FAST:
        assert err < 0.05, "did not converge"
    print("inverse_yield OK")


if __name__ == "__main__":
    main()
