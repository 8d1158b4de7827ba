# coding=utf-8
"""Documented negative results, quarantined from the live package.

These modules are measured, tested alternatives that LOST to the blocked
kernel ladder (see BASELINE.md optimization ladder):

* ``pallas_frame`` — whole-frame kernel over the UNblocked dense edge
  matrix: parity-exact, 4.8× slower than the op-composed path (O(E·N)
  one-hot gathers dominate).  Reachable via ``frame_backend="fused"``.
* ``pallas_cg`` — whole-CG kernel over the unblocked dense S; superseded
  by ops/pallas_blocked_cg.py (block tables fit VMEM, 48 MB gate).

Kept for their regression tests and as an honest engineering record; they
are NOT on any "auto" execution path.
"""
