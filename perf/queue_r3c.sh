#!/bin/bash
# Round-3 continuation queue: density-throughput frontier at the pinned
# transplant length-scale (0.00714 normalised ~ 3 km). Seed-robustness for
# d250 (only seed 0 existed) and a d200 probe (grid spacing 0.005 still
# resolves ls 0.00714). 120-cap protocol identical to
# docs/results/flagship_d350_seed_robustness.json.
set -u
cd /root/repo
# `python perf/train_flagship.py` puts perf/ (not the repo root) on
# sys.path — export both the repo root and the axon site (CLAUDE.md:
# never set PYTHONPATH without /root/.axon_site or the TPU backend
# silently won't register).
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r3c_queue.log
run() {
  name=$1; shift
  echo "=== $name $(date -u +%H:%M:%S) ===" >> $LOG
  timeout 3600 python perf/train_flagship.py /tmp/r3c_$name "$@" >> $LOG 2>&1
  echo "=== $name exit $? $(date -u +%H:%M:%S) ===" >> $LOG
}
run d250_s1 n_epochs=120 internal_density=250 init_lengthscale=0.00714 seed=1
run d250_s2 n_epochs=120 internal_density=250 init_lengthscale=0.00714 seed=2
run d200_s0 n_epochs=120 internal_density=200 init_lengthscale=0.00714 seed=0
run d200_s1 n_epochs=120 internal_density=200 init_lengthscale=0.00714 seed=1
run d200_s2 n_epochs=120 internal_density=200 init_lengthscale=0.00714 seed=2
run d160_s0 n_epochs=120 internal_density=160 init_lengthscale=0.00714 seed=0
echo "=== QUEUE DONE $(date -u +%H:%M:%S) ===" >> $LOG
