#!/bin/bash
# Round-5 TPU queue A: serving/training perf evidence (VERDICT r4 items 4-6).
# Serialized — the v5e-1 relay contends badly across processes.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== remat-policy sweep (item 4) ==="
# parity flagship train step, batch 8+16: packed/unpacked x policies
for lane in '"domain"' 'false'; do
  for pol in 'null' '"dots"' '"acts"'; do
    echo "--- lane_pack=$lane remat_policy=$pol"
    timeout 2400 python perf/train_bench.py 8 16 remat=true lane_pack=$lane remat_policy=$pol || echo "FAILED lane=$lane pol=$pol"
  done
done

echo "=== hoist gate win case (item 6): mlp_layers=0 cnp, d120/d350 ==="
for d in 120 350; do
  for hoist in true false; do
    echo "--- density=$d hoist=$hoist"
    timeout 2400 python perf/cycle_variant.py internal_density=$d likelihood='"cnp"' mlp_layers=0 hoist_head=$hoist || echo "FAILED d=$d hoist=$hoist"
  done
done

echo "=== cycle stage attribution (item 5) ==="
timeout 3600 python perf/cycle_attribution.py 500 || echo "FAILED attribution"

echo "=== parity cycle check (bench.py) ==="
timeout 2400 python bench.py || echo "FAILED bench"

echo "QUEUE A DONE"
