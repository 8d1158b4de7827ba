# coding=utf-8
"""Generate procedural demo assets (no mesh files are copied from anywhere).

* ``cube.stl``  — unit cube, 12 triangles (counterpart of the reference's
  cube asset for the 3D explicit/autodiff demo configs).
* ``spot.obj``  — a procedural icosphere-based blob of roughly the same
  vertex budget (~600 vertices) as the reference's spot demo mesh, used by
  ``configs/demo_spot.json`` as the implicit-CG-at-scale demo body.

Run:  python assets/make_assets.py
"""

from __future__ import annotations

import os

import numpy as np


def cube_mesh():
    v = np.array(
        [
            [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
            [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
        ],
        np.float64,
    )
    f = np.array(
        [
            [0, 2, 1], [0, 3, 2],
            [4, 5, 6], [4, 6, 7],
            [0, 1, 5], [0, 5, 4],
            [2, 3, 7], [2, 7, 6],
            [0, 4, 7], [0, 7, 3],
            [1, 2, 6], [1, 6, 5],
        ],
        np.int64,
    )
    return v, f


def icosphere(subdiv: int = 3, radius: float = 0.5):
    """Icosahedron subdivided ``subdiv`` times (subdiv=3 → 642 vertices)."""
    t = (1.0 + 5 ** 0.5) / 2.0
    v = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    for _ in range(subdiv):
        cache = {}
        verts = list(v)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (verts[a] + verts[b]) / 2.0
                m /= np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(m)
            return cache[key]

        nf = []
        for a, b, c in f:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.array(verts)
        f = np.array(nf, np.int64)
    return v * radius, f


def blob(subdiv: int = 2):
    """A lumpy non-convex deformation of the icosphere (so the tet mesher's
    winding-number filtering is actually exercised)."""
    v, f = icosphere(subdiv, radius=0.5)
    n = v / np.linalg.norm(v, axis=1, keepdims=True)
    bump = (
        0.18 * np.sin(3.0 * n[:, 0]) * np.cos(2.0 * n[:, 1])
        + 0.12 * np.sin(4.0 * n[:, 2])
    )
    v = v * (1.0 + bump)[:, None]
    v[:, 1] *= 0.8  # squash: vaguely animal-torso proportions
    return v, f


def write_obj(path, v, f):
    with open(path, "w") as fh:
        for p in v:
            fh.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for tri in f + 1:
            fh.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")


def write_binary_stl(path, v, f):
    tris = v[f].astype(np.float32)
    with open(path, "wb") as fh:
        fh.write(b"\0" * 80)
        fh.write(np.uint32(len(f)).tobytes())
        for t in tris:
            normal = np.cross(t[1] - t[0], t[2] - t[0])
            nn = np.linalg.norm(normal)
            normal = normal / nn if nn > 0 else normal
            fh.write(normal.astype(np.float32).tobytes())
            fh.write(t.tobytes())
            fh.write(b"\0\0")


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    cv, cf = cube_mesh()
    write_binary_stl(os.path.join(here, "cube.stl"), cv, cf)
    bv, bf = blob(subdiv=3)  # 642 verts ≈ the reference spot's 587
    write_obj(os.path.join(here, "spot.obj"), bv, bf)
    print(f"cube.stl: {len(cv)} verts / {len(cf)} tris")
    print(f"spot.obj: {len(bv)} verts / {len(bf)} tris")


if __name__ == "__main__":
    main()
