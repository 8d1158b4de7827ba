# coding=utf-8
"""Observability: profiler harness, throughput timing, NaN guards, metrics.

The reference's only tracing is Taichi's kernel profiler, enabled but with its
print hooks commented out (reference main.py:40,114-115), and its only
"failure detection" is a determinant clamp + Jacobi rollback (SURVEY §5).
Here: a ``jax.profiler`` trace context, a steps/s meter, NaN-guarded stepping
for debug runs, and per-frame structured physics metrics.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fem_tpu.models.state import FemObject, SimState
from fem_tpu.ops import smallmat as sm
from fem_tpu.ops.element import deformation_gradients, total_energy


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fem_tpu_trace") -> Iterator[None]:
    """Capture a device profile viewable in TensorBoard/XProf."""
    with jax.profiler.trace(log_dir):
        yield


class StepsMeter:
    """Steps/s counter for driver loops (replaces the reference's commented
    ``ti.profiler`` prints, main.py:114-115)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.steps = 0

    def add(self, n: int) -> None:
        self.steps += n

    @property
    def steps_per_s(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.steps / dt if dt > 0 else float("inf")


class FrameMetrics(NamedTuple):
    """Per-frame physics diagnostics."""

    elastic_energy: float
    kinetic_energy: float
    min_det_f: float
    max_speed: float
    any_nan: bool


@jax.jit
def _metrics_impl(obj: FemObject, state: SimState):
    F = deformation_gradients(state.pos, obj.element_indices, obj.ref_inv)
    det = sm.det(F)
    u = total_energy(
        state.pos, obj.element_indices, obj.ref_inv, obj.volume,
        obj.mu, obj.s_lambda, obj.material,
    )
    v = state.vel + state.vel_g
    ke = 0.5 * jnp.sum(obj.mass * jnp.sum(v * v, axis=-1))
    speed = jnp.sqrt(jnp.max(jnp.sum(v * v, axis=-1)))
    # Divergence flag over the FULL kinematic state, not positions alone:
    # a stalling solver can blow velocities/energy sky-high while positions
    # remain representable for a while (measured: the unfloored-PCG Newton
    # divergence at 68k reported finite positions with KE ≈ 6e7 and
    # min det F ≈ −3e8 — a soak must not print OK for that state).
    bad = (
        ~jnp.all(jnp.isfinite(state.pos))
        | ~jnp.all(jnp.isfinite(v))
        | ~jnp.isfinite(u)
        | (jnp.max(jnp.abs(det)) > 1e3)  # an element grew 1000×: garbage
    )
    return u, ke, jnp.min(det), speed, bad


def frame_metrics(obj: FemObject, state: SimState) -> FrameMetrics:
    """Structured per-frame stats (SURVEY §5: returned as auxiliaries instead
    of the reference's ad-hoc prints).  One jitted dispatch per call."""
    u, ke, min_det, speed, pos_nan = _metrics_impl(obj, state)
    return FrameMetrics(
        elastic_energy=float(u),
        kinetic_energy=float(ke),
        min_det_f=float(min_det),
        max_speed=float(speed),
        any_nan=bool(pos_nan),
    )


class SimulationDiverged(RuntimeError):
    pass


def check_state(obj: FemObject, state: SimState, step: int) -> FrameMetrics:
    """NaN-guarded stepping: raise with diagnostics when the state diverges
    (new capability — the reference silently NaNs, SURVEY §5)."""
    m = frame_metrics(obj, state)
    if m.any_nan:
        bad = int(np.sum(~np.isfinite(np.asarray(state.pos))))
        raise SimulationDiverged(
            f"non-finite positions at step {step}: {bad} bad entries, "
            f"min det F = {m.min_det_f:.3e} (inverted element?), "
            f"max speed = {m.max_speed:.3e}"
        )
    return m
