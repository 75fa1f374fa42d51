#!/bin/bash
# Warm every bench stage's kernel compile cache by running stage bodies
# directly (no per-attempt caps, unlike the orchestrator -- the
# orchestrator's 240/300 s stage caps can never complete a 10-25 min
# cold remote compile, so warming MUST happen out-of-band after any
# kernel edit; CLAUDE.md mandates this before round end). Run from
# /root/repo with ambient env (TPU). Order: cheap first, heavy compiles
# last; each under a generous outer timeout so a wedged tunnel can't
# hold the shell forever.
cd /root/repo || exit 1
for st in msa_compat batch8 batch32 traced msa_native packed \
          traced_batch msa_50k batch128 msa_fleet msa_200k \
          chunk_smoke int16_probe; do
  echo "=== warming stage $st ==="
  timeout 2400 python bench.py --stage "$st" 2>&1 | tail -2
  echo "=== $st rc=$? ==="
done
echo WARM_ALL_DONE
