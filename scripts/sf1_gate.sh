#!/bin/bash
# Standing sf1.0 correctness spot gate (r18 — VERDICT r17 "make the sf1.0
# gate a fixture"). One command per round:
#
#     scripts/sf1_gate.sh r18        # → CORRECTNESS_SF1_r18.json
#
# What it does:
#   1. synthesizes /tmp/sf1.0 (10× of sf0.1, graft.tools.ScaleUp) if absent;
#   2. runs graft.Verify restricted to the gate row list (one forked JVM,
#      48g heap — the 6.0M-row plans need it);
#   3. oracle-compares ONE ROW AT A TIME through scripts/check.py with an
#      80GB DuckDB memory cap + /tmp spill dir (the r17 lesson: a banding
#      CTE referenced 4× re-inlined and spilled >80GB in one process; the
#      per-row loop bounds the peak and a single row's failure can't take
#      the batch down), merging the per-row artifacts into one JSON.
#
# Row list = the 26 rows gated in r19 plus the per-round rotation (r20,
# VERDICT r19 item #6: the next-costliest ungated rows by the sf1.0
# cost ranking — d_tfidf_keywords, d_dedup_winnow_vs_index,
# d_pipeline_pack, d_dedup_ngram — bringing the standing gate to 30
# rows). Override with SF1_ROWS for a custom slice.
set -u
cd "$(dirname "$0")/.."
TAG=${1:?usage: scripts/sf1_gate.sh <round-tag, e.g. r19>}
SF1=${SF1_DIR:-/tmp/sf1.0}
OUT=${SF1_OUT:-/tmp/verify_sf1}
MEM=${GRAFT_DUCKDB_MEM:-80GB}
ROWS=${SF1_ROWS:-"d_dedup_cosine_incremental,d_dedup_cosine_lsh,d_dedup_cosine_vs_index,d_dedup_criteria_matrix,d_pii_scrub,d_text_surprisal2,d_tokenize_ids,m_media_dedup_rates,m_media_dedup_removal,q1_pricing_summary,q8_star_join,s_ann_ivfpq,s_ann_ivfsq8,s_ann_pq,s_ann_projected_indexed,s_ann_sq8_indexed,d_dedup_simhash,d_pack_tokens,e_agg_groupby,s_ann_ivf_sharded,s_ann_ivfpq_trained_indexed,d_dedup_clusters_star,d_dedup_removal_best,d_text_surprisal,d_bm25_multi,s_ann_ivf_sharded_trained_indexed,d_tfidf_keywords,d_dedup_winnow_vs_index,d_pipeline_pack,d_dedup_ngram"}

if [ ! -e "$SF1/lineitem.parquet" ]; then
  echo "== building $SF1 (ScaleUp 10x of sf0.1)"
  sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 $SF1 10" \
    || { echo "ScaleUp failed"; exit 1; }
fi

echo "== dumping ${ROWS//,/ } at $SF1"
rm -rf "$OUT"
SPARK_GRAFT_ONLY="$ROWS" SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g} \
  sbt -batch "runMain graft.Verify $SF1 $OUT" \
  || { echo "Verify failed"; exit 1; }

echo "== oracle compare, one row at a time (DuckDB mem $MEM)"
mkdir -p /tmp/sf1_rows
rc=0
IFS=',' read -ra ROWARR <<< "$ROWS"
for row in "${ROWARR[@]}"; do
  GRAFT_CHECK_ONLY="$row" GRAFT_DUCKDB_MEM="$MEM" \
    python3 scripts/check.py "$SF1" "$OUT" "/tmp/sf1_rows/$row.json" \
    || rc=1
done

# forced-cap-0 row (r21 — VERDICT r20 item #5): every closure at sf0.1
# AND sf1.0 stays under the 2M-edge cap, so the distributed star-CC path
# would otherwise be exercised only by unit tests. One gate row re-runs
# the clusters_star closure with GRAFT_CC_LOCAL_EDGES=0 (distributed
# path forced) and oracle-compares it under its own key, so a
# distributed-path regression cannot hide behind the driver fast path.
CAP0_ROW=${SF1_CAP0_ROW:-d_dedup_clusters_star}
echo "== forced-cap-0 distributed-CC gate row: $CAP0_ROW"
rm -rf "$OUT.cap0"
GRAFT_CC_LOCAL_EDGES=0 SPARK_GRAFT_ONLY="$CAP0_ROW" \
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g} \
  sbt -batch "runMain graft.Verify $SF1 $OUT.cap0" \
  || { echo "cap-0 Verify failed"; rc=1; }
GRAFT_CHECK_ONLY="$CAP0_ROW" GRAFT_DUCKDB_MEM="$MEM" \
  python3 scripts/check.py "$SF1" "$OUT.cap0" "/tmp/sf1_rows/__cap0.json" \
  || rc=1
python3 - "$CAP0_ROW" <<'EOF'
import json, sys
row = sys.argv[1]
try:
    j = json.load(open("/tmp/sf1_rows/__cap0.json"))
    json.dump({f"{row}__cap0": j[row]}, open("/tmp/sf1_rows/__cap0.json", "w"))
except Exception as e:
    json.dump({f"{row}__cap0": {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None, "oracle_rows": None,
               "err": f"cap0 check produced no artifact: {e}"}},
              open("/tmp/sf1_rows/__cap0.json", "w"))
EOF

python3 - "$TAG" "${ROWARR[@]}" <<'EOF'
import json, sys
tag, rows = sys.argv[1], sys.argv[2:]
merged = {}
for r in rows:
    try:
        merged.update(json.load(open(f"/tmp/sf1_rows/{r}.json")))
    except FileNotFoundError:
        merged[r] = {"rows_match": False, "schema_match": False,
                     "hash_match": False, "spark_rows": None,
                     "oracle_rows": None, "err": "check.py produced no artifact"}
try:
    merged.update(json.load(open("/tmp/sf1_rows/__cap0.json")))
except FileNotFoundError:
    pass
out = f"CORRECTNESS_SF1_{tag}.json"
json.dump(merged, open(out, "w"), indent=1, sort_keys=True)
ok = sum(1 for v in merged.values()
         if v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))
print(f"== {out}: {ok}/{len(merged)} rows green")
EOF
exit $rc
