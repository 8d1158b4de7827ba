# coding=utf-8
"""Scene assembly: config → objects + obstacles + compiled step functions.

The reference builds this in ``__main__`` (main.py:51-61).  Kept separate here
so the CLI, tests and benchmarks share one loader.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from fem_tpu.models.mesh import load_object_mesh
from fem_tpu.models.state import FemObject, Obstacles, SimState, build_object
from fem_tpu.utils.config import SimConfig


class SceneObject:
    """One soft body plus its export auxiliaries."""

    def __init__(self, obj: FemObject, state: SimState, aux: dict):
        self.obj = obj
        self.state = state
        self.aux = aux  # obj_vertices / obj_faces / map_index for 3D export


def load_scene(
    cfg: SimConfig, interior_spacing: Optional[float] = None
) -> Tuple[List[SceneObject], Obstacles]:
    """Build all soft bodies and the obstacle set from a parsed config
    (reference: main.py:57-61)."""
    scene = []
    for ocfg in cfg.objects:
        vertices, faces, elements, aux = load_object_mesh(
            ocfg, interior_spacing
        )
        obj, state = build_object(
            ocfg, vertices, faces, elements,
            operator_mode=cfg.operator_mode,
        )
        print(f"Vertex count: {obj.particle_cnt}")  # parity: object.py:75-77
        print(f"Mesh count: {obj.mesh_cnt}")
        print(f"Element count: {obj.element_cnt}")
        scene.append(SceneObject(obj, state, aux))
    obstacles = Obstacles.from_configs(cfg.blocks, cfg.dim, cfg.obstacles)
    return scene, obstacles


def method_banner(cfg: SimConfig) -> str:
    """The reference's startup banner (main.py:74-80)."""
    if cfg.use_explicit_method:
        return (
            "Simulation method: explicit method. "
            f"Auto-diff {bool(cfg.auto_diff)}"
        )
    if cfg.implicit_method == 0:
        return "Simulation method: implicit method. System Solver: jacobian iteration."
    return (
        "Simulation method: implicit method. System Solver: conjugate "
        f"gradient. Preconditioned: {bool(cfg.preconditioned)}"
    )
