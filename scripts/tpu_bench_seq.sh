#!/bin/bash
# Serialized TPU measurement queue: waits for the axon tunnel to recover,
# then runs the headline bench (current + CHAIN_R=96), the per-op profile,
# and the IPM bench modes. One TPU job at a time (compiles serialize).
cd /root/repo
log=${1:-/tmp/tpu_seq.log}

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
jax.block_until_ready(jax.jit(lambda x: x + 1)(jnp.ones((4,))))
print('PROBE_OK')" 2>/dev/null | grep -q PROBE_OK
}

n=0
until probe; do
  n=$((n+1))
  echo "$(date +%H:%M:%S) tpu down (probe $n)" >> "$log"
  if [ $n -gt 60 ]; then echo "giving up" >> "$log"; exit 1; fi
  sleep 300
done
echo "$(date +%H:%M:%S) tpu up — starting sequence" >> "$log"

run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$log"
  "$@" >> "$log" 2>&1
  echo "=== exit $?" >> "$log"
}

run timeout 2400 python bench.py
run env TREEQP_BENCH_CHAIN=96 timeout 2400 python bench.py
run timeout 3600 python scripts/prof_df.py
run env TREEQP_IPM_MODE=ms_f32r_pallas timeout 2400 python -m benchmarks.ipm_bench
run env TREEQP_IPM_MODE=ms_f32_pallas timeout 2400 python -m benchmarks.ipm_bench
run env TREEQP_IPM_MODE=ms_f64 timeout 2400 python -m benchmarks.ipm_bench
run env TREEQP_IPM_MODE=f64 TREEQP_IPM_CHAIN=1 TREEQP_IPM_NREP=2 timeout 3000 python -m benchmarks.ipm_bench
echo "$(date +%H:%M:%S) sequence done" >> "$log"
