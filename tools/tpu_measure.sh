#!/usr/bin/env bash
# One-shot TPU re-measurement sequence for when the axon tunnel is up.
#
# Runs the full measurement battery SEQUENTIALLY (never two TPU processes
# at once — the tunnel serves exactly one; .claude/skills/verify/SKILL.md):
#   1. canary        : 30 s probe so a dead tunnel fails fast instead of
#                      hanging ~25 min in backend init
#   2. bench.py      : the driver's headline JSON (also a compile-cache warm)
#   3. e2e SPA       : 3 seeded replicates at the production scale
#                      (4096 x 128 px) -> /tmp/tpu_e2e_spa.json
#   4. e2e CSPT      : 4 series x 32 particles x 41 tilts -> stdout JSON
#
# Usage: nohup tools/tpu_measure.sh > /tmp/tpu_measure.log 2>&1 &
# Results land under /tmp/tpu_*; fold them into STATUS.md / docs/BENCH_E2E.md
# after inspection.
set -u
cd "$(dirname "$0")/.."

echo "=== canary $(date +%H:%M:%S)"
timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256, 256)); np.asarray((x @ x).ravel()[0])
print('canary OK', jax.devices())
" || { echo 'TUNNEL DOWN — aborting'; exit 1; }

echo "=== bench.py $(date +%H:%M:%S)"
timeout 3000 python bench.py | tee /tmp/tpu_bench.json

echo "=== e2e SPA x3 $(date +%H:%M:%S)"
timeout 7200 python tools/benchmark_e2e_spa.py 4096 128 \
    --replicates 3 --out /tmp/tpu_e2e_spa.json

echo "=== e2e CSPT $(date +%H:%M:%S)"
timeout 3600 python tools/benchmark_e2e_tomo.py 4 32 64 | tee /tmp/tpu_e2e_tomo.log

echo "=== DONE $(date +%H:%M:%S)"
