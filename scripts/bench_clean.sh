#!/bin/bash
# Canary-banded two-scale bench wrapper (r19 — VERDICT r18 item #1: the
# r18 artifacts were committed from degraded host windows, provably so by
# their own canary pairs, which made round-over-round totals
# incomparable; the fix is an ACCEPTANCE BAND on the canary, not code).
#
# Runs graft.Bench against <sfDir> and accepts the artifact only when the
# embedded noise-canary pair is in band:
#
#     first <= 0.65 s        (the r18 good-window canary value; degraded
#                             windows measured 0.8-1.2)
#     last/first <= 1.15     (no within-run drift — the sf0.1 r18pre
#                             artifact drifted 1.41x inside one run)
#
# Out-of-band runs retry after a pause (windows on this VM migrate on the
# ~minutes scale, BENCH_NOTES r18); if no attempt lands in band the BEST
# attempt (lowest max(first, last)) is kept and the script exits 1 so the
# caller knows the baseline is still window-qualified, not clean.
#
# Usage:
#   scripts/bench_clean.sh /root/testdata/sf0.1 BENCH_SF01_r19.json [tries]
#   SF1 example: scripts/bench_clean.sh /tmp/sf1.0 BENCH_SF1_r19.json
set -u
cd "$(dirname "$0")/.."
SF=${1:?usage: bench_clean.sh <sfDir> <outFile> [maxTries]}
OUT=${2:?usage: bench_clean.sh <sfDir> <outFile> [maxTries]}
TRIES=${3:-5}
BAND_FIRST=${CANARY_MAX_FIRST:-0.65}
BAND_RATIO=${CANARY_MAX_RATIO:-1.15}
PAUSE=${CANARY_RETRY_PAUSE:-90}

best_score=""
for i in $(seq 1 "$TRIES"); do
  echo "== bench attempt $i/$TRIES at $SF"
  # a stale BENCH_FULL.json from a previous attempt/invocation must never
  # be scored as THIS attempt's output (r19 advisor): delete before sbt so
  # only an artifact this run produced can pass the -s check below
  rm -f BENCH_FULL.json
  SPARK_GRAFT_SF_DIR="$SF" sbt -batch "runMain graft.Bench" \
    > "/tmp/bench_clean_attempt$i.log" 2>&1
  if [ ! -s BENCH_FULL.json ]; then
    echo "   attempt $i produced no BENCH_FULL.json (see /tmp/bench_clean_attempt$i.log)"
    continue
  fi
  # one-line-JSON contract (r21 — VERDICT r20 item #5): the round driver
  # parses the bench JSON from captured stdout, and r19's tail-truncated
  # line silently cost the whole round-over-round comparison. Fail the
  # attempt loudly when the run log carries no complete bench JSON line.
  # (scripts/bench_json_contract_selftest.py pins both verdicts.)
  if ! python3 scripts/bench_json_contract.py "/tmp/bench_clean_attempt$i.log"; then
    echo "   attempt $i violated the one-line bench-JSON stdout contract (see /tmp/bench_clean_attempt$i.log)"
    continue
  fi
  first="" last="" total=""  # a failed read must not inherit the previous attempt's values
  read -r first last total <<< "$(python3 - <<'EOF'
import json
try:
    j = json.load(open("BENCH_FULL.json"))
    c = j.get("canary", {})
    print(c.get("first", 99), c.get("last", 99), j.get("value", -1))
except Exception:
    pass  # malformed artifact -> empty read, caught below
EOF
)"
  if [ -z "${first:-}" ] || [ -z "${last:-}" ] || [ -z "${total:-}" ]; then
    echo "   attempt $i produced a malformed BENCH_FULL.json; skipping"
    continue
  fi
  score=$(python3 -c "print(max($first, $last))")
  ratio=$(python3 -c "print($last / $first if $first > 0 else 99)")
  echo "   canary first=$first last=$last (ratio $ratio), total=$total s"
  cp BENCH_FULL.json "/tmp/bench_clean_attempt$i.json"
  if [ -z "$best_score" ] || python3 -c "exit(0 if $score < $best_score else 1)"; then
    best_score=$score
    cp BENCH_FULL.json "$OUT.candidate"
  fi
  if python3 -c "exit(0 if $first <= $BAND_FIRST and $ratio <= $BAND_RATIO else 1)"; then
    cp BENCH_FULL.json "$OUT"
    rm -f "$OUT.candidate"
    echo "== ACCEPTED attempt $i -> $OUT (canary in band: first<=$BAND_FIRST, ratio<=$BAND_RATIO)"
    exit 0
  fi
  [ "$i" -lt "$TRIES" ] && { echo "   out of band; retrying in ${PAUSE}s"; sleep "$PAUSE"; }
done
if [ ! -f "$OUT.candidate" ]; then
  echo "== NO attempt produced a parseable BENCH_FULL.json after $TRIES tries; nothing written to $OUT"
  exit 2
fi
mv "$OUT.candidate" "$OUT"
echo "== NO attempt landed in band after $TRIES tries; kept best (max-canary $best_score) -> $OUT"
echo "   this baseline is window-qualified, NOT clean — rerun in a quieter window"
exit 1
