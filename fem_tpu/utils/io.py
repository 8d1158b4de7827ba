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


def save_checkpoint(
    path: str, state: SimState, step: int, virtual_time: float
) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(
        path,
        pos=np.asarray(state.pos),
        vel=np.asarray(state.vel),
        vel_g=np.asarray(state.vel_g),
        force=np.asarray(state.force),
        jacobi_past_x=np.asarray(state.jacobi_past_x),
        step=np.int64(step),
        virtual_time=np.float64(virtual_time),
    )


def load_checkpoint(path: str) -> tuple[SimState, int, float]:
    data = np.load(path)
    state = SimState(
        pos=jnp.asarray(data["pos"]),
        vel=jnp.asarray(data["vel"]),
        vel_g=jnp.asarray(data["vel_g"]),
        force=jnp.asarray(data["force"]),
        jacobi_past_x=jnp.asarray(data["jacobi_past_x"]),
    )
    return state, int(data["step"]), float(data["virtual_time"])
