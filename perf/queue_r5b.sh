#!/bin/bash
# Round-5 TPU queue B: training evidence (VERDICT r4 items 2-3).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== four-likelihood-family scoring (item 3): humidity + pressure r5 ==="
timeout 5400 python perf/train_flagship.py /tmp/flag_humidity_r5 variable='"humidity"' likelihood='"cnp-spikes-beta"' || echo "FAILED humidity"
cp /tmp/flag_humidity_r5/metrics.json docs/results/flagship_humidity_r5_metrics.json 2>/dev/null
timeout 5400 python perf/train_flagship.py /tmp/flag_pressure_r5 variable='"surface_pressure"' likelihood='"cnp"' n_epochs=150 || echo "FAILED pressure"
cp /tmp/flag_pressure_r5/metrics.json docs/results/flagship_pressure_r5_metrics.json 2>/dev/null

echo "=== multi-world profile robustness (item 2) ==="
timeout 14400 python perf/profile_robustness.py || echo "FAILED robustness"

echo "=== production-path rerun with f32 fetch + tree-synced upload ==="
timeout 7200 python perf/operational_bench.py --production_only --out docs/results/operational_month_r5_production.json || echo "FAILED production rerun"

echo "QUEUE B DONE"
