#!/bin/bash
# Round-readiness checks: everything the driver exercises, in one script.
#   bash tools/run_all_checks.sh
set -e
cd "$(dirname "$0")/.."

echo "=== 1/4 test suite (CPU, 8 virtual devices) ==="
python -m pytest tests/ -q

echo "=== 2/4 entry() compile check ==="
python - <<'EOF'
import jax
import __graft_entry__ as g
fn, args = g.entry()
out = jax.jit(fn)(*args)
jax.block_until_ready(out[0].pos)
import numpy as np
assert np.isfinite(np.asarray(out[0].pos)).all()
print("entry OK")
EOF

echo "=== 3/4 dryrun_multichip(8) ==="
python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "=== 4/4 bench ==="
python bench.py

echo "ALL CHECKS PASSED"
