#!/usr/bin/env bash
# One-command round gate: every piece of evidence a round ships, in
# dependency order, with a PASS/FAIL line per stage — so "green" is
# reproducible by anyone (including the judge) with a single command
# instead of ~5 invocations from memory.
#
#   1. test      sbt test (unit + plan guards + edge-corpus oracle gates)
#   2. sf0.01    Verify dump + DuckDB hash-compare at the driver gate SF
#   3. sf0.1     the same sweep at 10x (catches corpus-size-dependent
#                constants; ~10 min)
#   4. cluster   sbt package + ClusterSmoke on local-cluster[4,8] — the
#                §8.4.10 multi-executor deserialization regression check
#   5. sweep     ClusterSweep: EVERY registered query under
#                local-cluster + spark.jars, content hashes vs local[32]
#                (round 16 full-registry task-binary check; round 17
#                upgraded counts -> sorted+ordered JSON-row hashes)
#   6. bench     the Bench contract line at sf0.1 (written to
#                target/round_gate/bench.json, NOT BENCH_r*.json — the
#                driver owns those)
#
# Usage: tools/run_round_gates.sh [stage ...]   (default: all stages)
# Logs per stage under target/round_gate/.
set -uo pipefail
cd "$(dirname "$0")/.."

if [[ $# -gt 0 ]]; then STAGES=("$@"); else STAGES=(test sf001 sf01 cluster sweep bench); fi
LOGDIR=target/round_gate
mkdir -p "$LOGDIR"
declare -A RESULT
FAILED=0

run_stage() { # name, command...
  local name="$1"; shift
  local t0=$SECONDS
  echo "=== stage $name: $*"
  if "$@" >"$LOGDIR/$name.log" 2>&1; then
    RESULT[$name]="PASS $((SECONDS - t0))s"
  else
    RESULT[$name]="FAIL $((SECONDS - t0))s (see $LOGDIR/$name.log)"
    FAILED=1
  fi
  echo "--- $name: ${RESULT[$name]}"
}

stage_test()  { sbt -batch test; }
stage_sf001() {
  rm -rf "$LOGDIR/out001"
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $LOGDIR/out001" &&
    python3 tools/check_correctness.py /root/testdata/sf0.01 "$LOGDIR/out001"
}
stage_sf01()   { tools/run_sf01_gate.sh /root/testdata/sf0.1 "$LOGDIR/out01"; }
stage_cluster() {
  # the smoke's own output goes to a dedicated file (NOT the in-flight
  # $LOGDIR/cluster.log this function's stdout is being redirected to —
  # grepping that relied on flush ordering)
  sbt -batch package &&
    SCALE_SMOKE_MASTER="local-cluster[4,8,7168]" SPARK_SCALA_VERSION=2.13 \
      tools/runmain.sh graft.ClusterSmoke /root/testdata/sf0.1 \
      > "$LOGDIR/cluster.out" 2>&1
  local rc=$?
  cat "$LOGDIR/cluster.out"
  [[ $rc -eq 0 ]] && ! grep -q FAILED "$LOGDIR/cluster.out"
}
stage_sweep() {
  # jar freshness is cluster's job (sbt package); when sweep runs alone
  # it still packages to avoid a stale-jar false failure
  sbt -batch package &&
    SPARK_SCALA_VERSION=2.13 tools/runmain.sh graft.ClusterSweep \
      /root/testdata/sf0.001 > "$LOGDIR/sweep.out" 2>"$LOGDIR/sweep.err"
  local rc=$?
  cat "$LOGDIR/sweep.out"
  [[ $rc -eq 0 ]] && grep -q "content hashes match" "$LOGDIR/sweep.out" &&
    ! grep -q "MISMATCH\|FAILED" "$LOGDIR/sweep.out"
}
stage_bench() {
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    tools/runmain.sh graft.Bench | tee "$LOGDIR/bench.raw" &&
    grep '"metric"' "$LOGDIR/bench.raw" | tail -1 >"$LOGDIR/bench.json" &&
    [[ -s "$LOGDIR/bench.json" ]] &&
    python3 -m json.tool "$LOGDIR/bench.json" >/dev/null &&  # contract line must PARSE, not just exist
    python3 - "$LOGDIR/bench.json" <<'PY'  # r19: drift adjudication reads total_shared as a field
import json, sys
d = json.load(open(sys.argv[1]))
assert isinstance(d.get("total_shared"), (int, float)), "bench contract line must carry total_shared"
assert 0 < d["total_shared"] <= d["value"], (d["total_shared"], d["value"])
# r20 (r19 ADVICE): total_shared must sum the FULL shared query set —
# a failed shared query would silently shrink the subtotal and read as
# a performance move in the round-over-round drift comparison
assert d.get("shared_count") == d.get("shared_expected") != None, \
    (d.get("shared_count"), d.get("shared_expected"), d.get("failed"))
PY
}

for s in "${STAGES[@]}"; do
  case "$s" in
    test)    run_stage test    stage_test ;;
    sf001)   run_stage sf001   stage_sf001 ;;
    sf01)    run_stage sf01    stage_sf01 ;;
    cluster) run_stage cluster stage_cluster ;;
    sweep)   run_stage sweep   stage_sweep ;;
    bench)   run_stage bench   stage_bench ;;
    *) echo "unknown stage: $s (expected test|sf001|sf01|cluster|sweep|bench)"; exit 2 ;;
  esac
done

echo
echo "=== round gate summary"
for s in "${STAGES[@]}"; do
  printf '  %-8s %s\n' "$s" "${RESULT[$s]:-skipped}"
done
exit $FAILED
