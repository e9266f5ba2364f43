#!/bin/bash
# MEMORY-PRESSURE / SPILL DRILL: the frozen 62-query bench subset plus
# the five heaviest families run under a deliberately starved engine —
# local[8], a small heap, spark.memory.fraction lowered — so
# HashAggregate/sort/join spill paths actually execute. The drill
# asserts (a) every query still completes (zero [verify] failures),
# (b) outputs are hash-identical to an unconstrained reference run
# (tools/compare_dumps.py), and (c) records memory/disk bytes spilled
# per stage from the event logs (tools/spill_report.py). The reference
# deployment itself runs on 2 GB workers
# (docker-compose.override.yml:34-35); this drill is that regime.
#
# Usage: spill_drill.sh [sfDir] [outBase] [heap] [fraction]
set -uo pipefail

SF=${1:-/root/testdata/sf0.1}
OUT=${2:-/root/repo/target/spill_drill}
HEAP=${3:-1500m}
FRACTION=${4:-0.2}
REPO=/root/repo
JAR=$REPO/target/scala-2.13/kusuma_metamorphetlspark_2.13-0.1.0.jar
EVDIR=$OUT/events

# frozen bench subset (Bench.frozenSubset) + the five heaviest families
QUERIES="q_pii_scrub q_pivot_status q_pref_export q_pref_length_bias \
q_pref_pairs q_product_performance q_profile_orders q_pseudonymize \
q_quality_classifier q_quality_classifier_ref q_quality_score \
q_repetition q_rerank q_retention q_retrieval_eval q_rollup_docs \
q_rrf_fusion q_sample_k_per_lang q_scan_project q_scd2_merge \
q_semantic_dedup q_semi_anti q_set_ops q_sha_ledger_forgotten \
q_sha_ledger_probe q_shard_assign q_simhash_neardup q_skew_report \
q_snapshot_diff q_source_bt q_source_cap q_source_diversity \
q_source_mix_shares q_source_winrate q_split_leakage \
q_stratified_sample q_supplier_performance q_temperature_mix \
q_text_stats q_tfidf q_token_count q_top_tokens q_topk_global \
q_topk_native q_topk_rewrite q_train_split q_triangles q_unicode_norm \
q_unigram_drift q_unigram_encode q_unigram_fertility \
q_unigram_forgotten q_unigram_merged q_unigram_train \
q_user_value_deltas q_video_neardup q_vocab_build q_weighted_sample \
q_winsorize q_wordpiece_bytefallback q_wordpiece_encode q_zorder_key \
q_ingest_funnel q_mmr_rerank q_dsir_sample q_ann_pq_rerank_sweep \
q_minhash_lsh q_dedup_clusters_lsh q_dup_spans q_customer_sales_report"
# override for targeted runs (e.g. the x10 heavy-family pressure run —
# sf0.1 never pressures even a starved heap; measured zero spills)
QUERIES=${SPILL_QUERIES:-$QUERIES}

mkdir -p "$OUT" "$EVDIR"

run() { # $1 = outdir, $2 = eventlog subdir, $3 = heap, $4 = fraction
  mkdir -p "$EVDIR/$2"
  SPARK_GRAFT_CPUS=8 SPARK_GRAFT_REPO=$REPO \
  /opt/spark/bin/spark-submit \
    --master 'local[8]' \
    --driver-memory "$3" \
    --conf spark.memory.fraction="$4" \
    --conf spark.eventLog.enabled=true \
    --conf spark.eventLog.dir=$EVDIR/$2 \
    --conf spark.eventLog.compress=true \
    --jars $REPO/lib/postgresql-42.7.2.jar \
    --class graft.Verify "$JAR" "$SF" "$1" $QUERIES
}

echo "== run 1/2: unconstrained reference (local[8], default memory)"
run "$OUT/base" base 24g 0.6 > "$OUT/base.log" 2>&1
grep "\[verify\].*failed" "$OUT/base.log" && { echo "BASE RUN RED"; exit 1; }

echo "== run 2/2: starved engine (heap=$HEAP fraction=$FRACTION)"
rm -rf "$OUT/tight"
run "$OUT/tight" tight "$HEAP" "$FRACTION" > "$OUT/tight.log" 2>&1
RC=$?
echo "rc=$RC"
FAILS=$(grep -c "\[verify\].*failed" "$OUT/tight.log" || true)
grep "\[verify\].*failed" "$OUT/tight.log" | head -5

echo "== hash compare (starved vs unconstrained)"
python3 "$REPO/tools/compare_dumps.py" "$OUT/base" "$OUT/tight" \
  | tee "$OUT/compare.txt" | tail -3
CMP=${PIPESTATUS[0]}

echo "== spill evidence"
python3 "$REPO/tools/spill_report.py" "$EVDIR/tight" \
  2> "$OUT/spill_stages.txt" | tee "$OUT/spill_report.json"
tail -5 "$OUT/spill_stages.txt"
python3 "$REPO/tools/spill_report.py" "$EVDIR/base" \
  2>/dev/null > "$OUT/base_spill_report.json"

if [ "$RC" = 0 ] && [ "$CMP" = 0 ] && [ "$FAILS" = 0 ]; then
  echo "SPILL DRILL PASS: green + hash-identical under $HEAP/$FRACTION"
else
  echo "SPILL DRILL FAIL: rc=$RC fails=$FAILS compare=$CMP"; exit 1
fi
