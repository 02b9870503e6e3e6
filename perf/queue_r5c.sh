#!/bin/bash
# Round-5 TPU queue C: refresh headline training throughput under the new
# remat_policy="acts" default (same session as the queue-A sweep, so these
# rows are relay-comparable to it).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== throughput profile (d120, pinned scale) batch 32, acts default ==="
timeout 2400 python perf/train_bench.py 32 internal_density=120 remat=true || echo "FAILED d120 b32"

echo "=== tuned profile (d350) batch 16, acts default ==="
timeout 2400 python perf/train_bench.py 16 internal_density=350 remat=true || echo "FAILED d350 b16"

echo "=== parity (d500) batch 8/16 acts default — headline refresh ==="
timeout 2400 python perf/train_bench.py 8 16 remat=true || echo "FAILED d500"

echo "QUEUE C DONE"
