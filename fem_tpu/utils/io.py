# coding=utf-8
"""Output + persistence: deformed-OBJ export and checkpoint/resume.

OBJ export mirrors the reference (object.py:322-335): copy deformed particle
positions onto the original surface mesh via the nearest-vertex map, write a
Wavefront OBJ.  Checkpointing is new capability (SURVEY §5: the reference has
none) — the full state pytree round-trips through a single ``.npz``.
"""

from __future__ import annotations

import os
import jax.numpy as jnp
import numpy as np

from fem_tpu.models.state import SimState


def export_deformed_obj(
    file_name: str,
    pos: np.ndarray,
    obj_vertices: np.ndarray,
    obj_faces: np.ndarray,
    map_index: np.ndarray,
) -> None:
    """Write the original OBJ with vertices moved to the deformed positions of
    their mapped tet-mesh particles (object.py:322-335)."""
    verts = np.asarray(pos)[map_index]
    with open(file_name, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for face in np.asarray(obj_faces) + 1:
            f.write(f"f {face[0]} {face[1]} {face[2]}\n")


_STATE_FIELDS = ("pos", "vel", "vel_g", "force", "jacobi_past_x")
# Optional per-element internal variables (inelastic material extensions) —
# written only when present, absent keys load as None.
_OPT_STATE_FIELDS = ("plastic_inv", "viscous_inv")


def save_checkpoint(
    path: str, state: SimState, step: int, virtual_time: float
) -> None:
    """Single-body checkpoint (library API); see save_scene_checkpoint for
    the multi-body CLI format."""
    save_scene_checkpoint(path, [state], step, virtual_time)


def load_checkpoint(path: str) -> tuple[SimState, int, float]:
    states, step, virtual_time, _ = load_scene_checkpoint(path)
    return states[0], step, virtual_time


def save_scene_checkpoint(
    path: str,
    states: "list[SimState]",
    step: int,
    virtual_time: float,
    ply_cnt: int = 0,
) -> None:
    """Checkpoint EVERY body's state pytree (bodies have distinct particle
    counts, so arrays are stored under per-body keys ``b{i}_pos`` etc.), plus
    the driver counters needed for bit-identical continuation (frame index,
    virtual_time, OBJ-export counter)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {"n_bodies": np.int64(len(states)),
              "step": np.int64(step),
              "virtual_time": np.float64(virtual_time),
              "ply_cnt": np.int64(ply_cnt)}
    for i, state in enumerate(states):
        for field in _STATE_FIELDS:
            arrays[f"b{i}_{field}"] = np.asarray(getattr(state, field))
        for field in _OPT_STATE_FIELDS:
            val = getattr(state, field, None)
            if val is not None:
                arrays[f"b{i}_{field}"] = np.asarray(val)
    np.savez(path, **arrays)


def load_scene_checkpoint(
    path: str,
) -> tuple["list[SimState]", int, float, int]:
    """Load a checkpoint written by :func:`save_scene_checkpoint` (also reads
    the legacy single-body flat-key format)."""
    data = np.load(path)
    if "n_bodies" in data:
        states = [
            SimState(
                **{
                    f: jnp.asarray(data[f"b{i}_{f}"])
                    for f in _STATE_FIELDS
                },
                **{
                    f: jnp.asarray(data[f"b{i}_{f}"])
                    for f in _OPT_STATE_FIELDS
                    if f"b{i}_{f}" in data
                },
            )
            for i in range(int(data["n_bodies"]))
        ]
        ply_cnt = int(data["ply_cnt"]) if "ply_cnt" in data else 0
    else:  # legacy round-1 format: one body, flat keys
        states = [SimState(**{f: jnp.asarray(data[f]) for f in _STATE_FIELDS})]
        ply_cnt = 0
    return states, int(data["step"]), float(data["virtual_time"]), ply_cnt
