# coding=utf-8
"""Shared test fixtures: tiny meshes and reference-config builders."""

import numpy as np

from fem_tpu.models.mesh import construct_2d_mesh
from fem_tpu.models.state import Obstacles, build_object
from fem_tpu.utils.config import BlockConfig, ObjectConfig, SimConfig


def make_2d_object(subdivisions=4, side_length=0.2, center=(0.5, 0.8), **mat):
    cfg = ObjectConfig(
        center=center, side_length=side_length, subdivisions=subdivisions, **mat
    )
    vertices, faces, elements = construct_2d_mesh(cfg)
    obj, state = build_object(cfg, vertices, faces, elements)
    return cfg, obj, state


def single_tet_object(**mat):
    """One unit tetrahedron."""
    cfg = ObjectConfig(center=(0.0, 0.0, 0.0), **mat)
    vertices = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
    )
    faces = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32)
    elements = np.array([[0, 1, 2, 3]], np.int32)
    obj, state = build_object(cfg, vertices, faces, elements)
    return cfg, obj, state


def two_tet_object(**mat):
    """Two tets sharing a face (5 particles)."""
    cfg = ObjectConfig(center=(0.0, 0.0, 0.0), **mat)
    vertices = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], np.float32
    )
    faces = np.zeros((0, 3), np.int32)
    elements = np.array([[0, 1, 2, 3], [1, 2, 3, 4]], np.int32)
    obj, state = build_object(cfg, vertices, faces, elements)
    return cfg, obj, state


def default_sim_config(**overrides):
    """The shipped default.json semantics (2D square, two circle blocks)."""
    base = dict(
        dim=2,
        delta_time=5e-4,
        sim_count=10,
        auto_diff=True,
        use_explicit_method=True,
        implicit_method=0,
        preconditioned=1,
        g_dir=(0.0, -1.0),
        objects=(ObjectConfig(),),
        blocks=(
            BlockConfig(id=0, block_center=(0.8, 0.5), block_radius=0.21),
            BlockConfig(id=1, block_center=(0.2, 0.5), block_radius=0.21),
        ),
    )
    base.update(overrides)
    return SimConfig(**base)


def default_obstacles(dim=2):
    return Obstacles.from_configs(
        (
            BlockConfig(id=0, block_center=(0.8, 0.5), block_radius=0.21),
            BlockConfig(id=1, block_center=(0.2, 0.5), block_radius=0.21),
        ),
        dim,
    )


def make_3d_object(subdivisions=4, side_length=0.2, center=(0.4, 0.6, 0.4),
                   **mat):
    """Structured 3D tet-grid body (construct_3d_grid_mesh — 6·sub³ tets)."""
    from fem_tpu.models.mesh import construct_3d_grid_mesh

    cfg = ObjectConfig(
        center=center, side_length=side_length, subdivisions=subdivisions,
        **mat
    )
    vertices, faces, elements = construct_3d_grid_mesh(cfg)
    obj, state = build_object(cfg, vertices, faces, elements)
    return cfg, obj, state


def default_sim_config_3d(**overrides):
    """3D counterpart of default_sim_config (demo_3d.json semantics: no
    obstacle blocks, gravity -y)."""
    base = dict(
        dim=3,
        delta_time=5e-4,
        sim_count=10,
        auto_diff=False,
        use_explicit_method=False,
        implicit_method=1,
        preconditioned=1,
        g_dir=(0.0, -1.0, 0.0),
        objects=(ObjectConfig(center=(0.4, 0.6, 0.4)),),
        blocks=(),
    )
    base.update(overrides)
    return SimConfig(**base)


def attach_edge_matrix(obj):
    """Attach the dense MXU edge matrix (built on demand since build_object
    only constructs it when operator_mode="mxu" is forced)."""
    import jax.numpy as jnp

    from fem_tpu.solvers.implicit import build_edge_matrix

    return obj.replace(
        edge_matrix=jnp.asarray(
            build_edge_matrix(np.asarray(obj.element_indices),
                              obj.particle_cnt)
        )
    )
