#!/usr/bin/env bash
# Mutated-twin scale board: near-dup (not byte-identical) ×K copies of
# sf0.1 — H grows ×K, stressing the rep-graph machinery the exact-copy
# boards never touch. Usage: tools/mutboard.sh <K> [names]
set -u
K="${1:-10}"
NAMES="${2:--}"
cd "$(dirname "$0")/.."
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-24g}" \
exec tools/run-main.sh graft.ScaleSmoke /root/testdata/sf0.1 "$K" "$NAMES" warm mutate
