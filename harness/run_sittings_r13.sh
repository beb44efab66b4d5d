#!/bin/bash
# Round-13 bench sittings: interleaved spark/duck pairs per SF, raw
# outputs to docs/bench_r13_{spark,duck}_<sf>_p<N>.json — same protocol
# as r10-r12 (each engine's per-query min is taken across sittings;
# pairs run back-to-back so both engines see the same contention
# episodes). sf1/sf10 inputs are the deterministic gen_sf.py outputs
# under /root/scratch (same generator, same seeds as r11/r12).
set -u
cd /root/repo
export SPARK_GRAFT_CPUS=32
run_pair () {  # $1 = sf dir, $2 = label, $3 = sitting index
  SPARK_GRAFT_SF_DIR="$1" timeout 2400 python bench.py \
    > "docs/bench_r13_spark_${2}_p${3}.json" 2>/dev/null
  echo "spark ${2} p${3} rc=$?"
  SPARK_GRAFT_SF_DIR="$1" timeout 2400 python harness/bench_duckdb.py \
    > "docs/bench_r13_duck_${2}_p${3}.json" 2>/dev/null
  echo "duck ${2} p${3} rc=$?"
}
for p in 1 2; do run_pair /root/testdata/sf0.1 sf0.1 $p; done
run_pair /root/scratch/sf1 sf1 1
for p in 1 2; do run_pair /root/scratch/sf10 sf10 $p; done
echo ALL-SITTINGS-DONE
