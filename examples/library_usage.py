# coding=utf-8
"""Library usage example: the high-level Simulation API.

Run:  python examples/library_usage.py
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import fem_tpu

# Build a scene from a config dict (same schema as the JSON files).
sim = fem_tpu.Simulation.from_dict(
    {
        "dim": 2,
        "delta_time": 5e-4,
        "sim_count": 10,
        "auto_diff": False,
        "use_explicit_method": False,  # implicit ...
        "implicit_method": 1,          # ... preconditioned CG
        "preconditioned": 1,
        "g_dir": [0, -1],
        "objects": [
            {"rho": 500, "center": [0.5, 0.7], "side_length": 0.25,
             "subdivisions": 12, "E": 4e4, "nu": 0.3, "damping": 8.0}
        ],
        "blocks": [
            {"block_center": [0.5, 0.25], "block_radius": 0.18}
        ],
    }
)
print(sim)

# Advance one virtual second with NaN-guarded stepping.  (The smoke test
# sets FEM_TPU_EXAMPLE_FAST=1 to keep CI cheap — same code path, fewer
# frames.)
fast = os.environ.get("FEM_TPU_EXAMPLE_FAST") == "1"
sim.run(seconds=0.05 if fast else 1.0, nan_guard=True)
m = sim.metrics()
print(
    f"t={sim.virtual_time:.2f}s  U={m.elastic_energy:.3f}  "
    f"KE={m.kinetic_energy:.4f}  min det F={m.min_det_f:.3f}"
)

# Render the final state to a PNG.
frame = sim.render(msgs=[f"t={sim.virtual_time:.2f}s"])
try:
    from PIL import Image

    Image.fromarray(frame).save("/tmp/fem_example.png")
    print("wrote /tmp/fem_example.png")
except ImportError:
    pass
