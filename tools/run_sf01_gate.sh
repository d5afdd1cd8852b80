#!/usr/bin/env bash
# One-command SF-independence gate: run the FULL registered query set at
# sf0.1 (10x the driver's gate corpus) and hash-compare against DuckDB
# with the same checker the driver uses at sf0.01.
#
# Why it exists: the round-11 one-off sf0.1 sweep caught a real bug the
# sf0.01 gate could not see (ss_ivf_recall's flat 0.8 floor firing on a
# healthy operator once the probed fraction shrank with corpus size).
# Operator constants that depend on corpus size — recall floors, dfCap,
# route switches — only get exercised when the corpus actually moves, so
# this should run at least once per round, on a quiet box (it is a
# correctness gate, not a benchmark; wall time ~10 min).
#
# Usage: tools/run_sf01_gate.sh [sfDir] [outDir]
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.1}"
OUT="${2:-/tmp/sf01_gate_out}"
rm -rf "$OUT"

# Verify dumps every SparkEntry.queries entry + oracle_sql.json;
# 16 cpus keeps peak memory sane at this SF while staying parallel.
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
  sbt -batch "runMain graft.Verify $SF $OUT"
python3 tools/check_correctness.py "$SF" "$OUT"
