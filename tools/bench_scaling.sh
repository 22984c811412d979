#!/usr/bin/env bash
# Two-cluster-size scaling evidence (north rule): run the identical e2e
# pipeline bench on the identical input at local[8] and local[32] and
# report throughput at both plus efficiency = (docs/s@32 / docs/s@8) / 4.
# No real cluster exists in this sandbox; parallelism level stands in for
# executor count per the driver instruction.
set -euo pipefail
cd "$(dirname "$0")/.."
DOCS="${SPARK_GRAFT_BENCH_DOCS:-40000}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
OUT="${1:-/tmp/scaling}"
mkdir -p "$OUT"
# Pin the JVM to exactly CPUS cores (taskset): a local[8] run on a 32-core
# box would otherwise get 24 free cores for GC/JIT threads — help an
# 8-executor cluster would not have — overstating small-N throughput and
# understating scaling efficiency.
for CPUS in 8 32; do
  echo "=== local[$CPUS] pinned to cores 0-$((CPUS-1)) ===" >&2
  SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_BENCH_DOCS=$DOCS \
    SPARK_GRAFT_PIPELINE_ONLY=1 \
    taskset -c 0-$((CPUS-1)) sbt -batch "runMain graft.Bench" 2>/dev/null \
    | sed -n 's/^\(\[info\] \)\?\({"metric".*\)$/\2/p' > "$OUT/bench_$CPUS.json"
  cat "$OUT/bench_$CPUS.json"
done
python3 - "$OUT" <<'EOF'
import json, sys
out = sys.argv[1]
b8 = json.load(open(f"{out}/bench_8.json"))
b32 = json.load(open(f"{out}/bench_32.json"))
eff = (b32["value"] / b8["value"]) / 4
print(json.dumps({
    "docs_per_sec_local8": b8["value"],
    "docs_per_sec_local32": b32["value"],
    "scaling_efficiency": round(eff, 3),
    "target": 0.8,
    "pass": eff >= 0.8,
}))
EOF
