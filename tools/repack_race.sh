#!/usr/bin/env bash
# Cross-process repack race gate: two JVMs resolve the same testdata
# through Tables' scan-layout repack against a FRESH shared repack root,
# racing the stage+atomic-rename protocol. Pass = both processes print
# identical content fingerprints (nobody read a partial publish) and no
# .tmp_* staging orphan survives. Usage: tools/repack_race.sh [sfDir]
set -u
SF="${1:-/root/testdata/sf0.1}"
cd "$(dirname "$0")/.."
ROOT="$(mktemp -d /tmp/graft_repack_race.XXXXXX)"
trap 'rm -rf "$ROOT"' EXIT
export SPARK_GRAFT_REPACK_DIR="$ROOT"
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-6g}"
tools/run-main.sh graft.RepackRace "$SF" > "$ROOT/a.out" 2>"$ROOT/a.err" &
PA=$!
tools/run-main.sh graft.RepackRace "$SF" > "$ROOT/b.out" 2>"$ROOT/b.err" &
PB=$!
wait $PA; RA=$?
wait $PB; RB=$?
if [ $RA -ne 0 ] || [ $RB -ne 0 ]; then
  echo "FAIL: process exit codes $RA/$RB"; tail -5 "$ROOT"/*.err; exit 1
fi
A=$(grep '^RACE' "$ROOT/a.out"); B=$(grep '^RACE' "$ROOT/b.out")
if [ "$A" != "$B" ]; then
  echo "FAIL: fingerprints differ"; echo "A: $A"; echo "B: $B"; exit 1
fi
ORPHANS=$(find "$ROOT" -maxdepth 3 -name '.tmp_*' | wc -l)
if [ "$ORPHANS" -ne 0 ]; then
  echo "FAIL: $ORPHANS staging orphans under $ROOT"; exit 1
fi
echo "PASS: identical fingerprints across 2 racing JVMs, zero orphans"
echo "$A"
