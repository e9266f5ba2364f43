#!/bin/bash
# ADVERSARIAL-SKEW BENCH ARTIFACT: runs the per-(source|lang)-keyed
# families on the uniform 10x-replicated corpus twin AND the mega-key
# twin (make_skew.py: identical volume/text, ALL docs in one source +
# one language), then emits target/skew_bench.json with per-query
# wall ratios — skew immunity as recorded telemetry instead of prose.
# Ratio ~1 = the caps/salting bound the mega-key; a quadratic or
# single-reducer path shows up as a blowup.
#
# Usage: skew_bench.sh [outJson]
set -euo pipefail

REPO=/root/repo
OUT=${1:-$REPO/target/skew_bench.json}
JAR=$REPO/target/scala-2.13/kusuma_metamorphetlspark_2.13-0.1.0.jar
U=$REPO/target/sf_skew_u
K=$REPO/target/sf_skew_1key

# the mega-key-sensitive families: per-source windows/prefixes,
# per-lang percentiles/samples/mixes, banded dedup, the funnel
QUERIES="q_minhash_lsh q_simhash_neardup q_dedup_clusters_lsh \
q_ingest_funnel q_curriculum q_source_cap q_boilerplate_apply \
q_dsir_weights q_top_tokens q_sample_k_per_lang q_temperature_mix \
q_lang_id"

[ -f "$U/documents.parquet" ] || \
  python3 "$REPO/tools/make_scale10.py" /root/testdata/sf0.01 "$U" 10
[ -f "$K/documents.parquet" ] || \
  python3 "$REPO/tools/make_skew.py" "$U" "$K"

run() { # $1 = dir, $2 = log — COLD first runs, fresh JVM per twin
  SPARK_GRAFT_CPUS=16 SPARK_GRAFT_REPO=$REPO \
  /opt/spark/bin/spark-submit --master 'local[16]' --driver-memory 16g \
    --class graft.Time "$JAR" "$1" $QUERIES > "$2" 2>&1
  grep "^TIMED" "$2"
}

echo "== uniform twin"
run "$U" "$REPO/target/skew_u.log" | tee /tmp/skew_u.txt
echo "== mega-key twin"
run "$K" "$REPO/target/skew_k.log" | tee /tmp/skew_k.txt

python3 - "$OUT" <<'EOF'
import json, re, sys
def parse(p):
    d = {}
    for l in open(p):
        m = re.match(r"TIMED (\S+) rows=(\d+) sec=([\d.]+)", l)
        if m: d[m.group(1)] = (int(m.group(2)), float(m.group(3)))
    return d
u, k = parse("/tmp/skew_u.txt"), parse("/tmp/skew_k.txt")
rows = {q: {"uniform_sec": u[q][1], "skew_sec": k[q][1],
            "ratio": round(k[q][1] / u[q][1], 3),
            "rows_uniform": u[q][0], "rows_skew": k[q][0]}
        for q in sorted(u) if q in k}
worst = max(rows.values(), key=lambda r: r["ratio"])["ratio"] if rows else None
out = {"queries": rows, "n": len(rows), "worst_ratio": worst}
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({q: r["ratio"] for q, r in rows.items()}, indent=1))
print(f"worst ratio: {worst}")
EOF
echo "wrote $OUT"
