#!/bin/bash
# Round-3 continuation queue (stage d): how far down does the internal grid
# go at the pinned transplant length-scale (0.00714)? d160 was fine at
# seed 0 (0.552 vs d350's 0.548); complete its seed triple and probe d120.
# 120-cap protocol identical to flagship_d350_seed_robustness.json.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r3d_queue.log
run() {
  name=$1; shift
  echo "=== $name $(date -u +%H:%M:%S) ===" >> $LOG
  timeout 3600 python perf/train_flagship.py /tmp/r3d_$name "$@" >> $LOG 2>&1
  echo "=== $name exit $? $(date -u +%H:%M:%S) ===" >> $LOG
}
run d160_s1 n_epochs=120 internal_density=160 init_lengthscale=0.00714 seed=1
run d160_s2 n_epochs=120 internal_density=160 init_lengthscale=0.00714 seed=2
run d120_s0 n_epochs=120 internal_density=120 init_lengthscale=0.00714 seed=0
run d120_s1 n_epochs=120 internal_density=120 init_lengthscale=0.00714 seed=1
run d120_s2 n_epochs=120 internal_density=120 init_lengthscale=0.00714 seed=2
echo "=== QUEUE DONE $(date -u +%H:%M:%S) ===" >> $LOG
