#!/bin/bash
# FAULT-INJECTION DRILL on the netns two-"host" cluster: the same
# Verify workload runs twice — once clean, once with worker B's
# executor SIGKILLed mid-run and then the ENTIRE worker-B network
# namespace torn down (host loss) — and the drill asserts the faulted
# run (a) completes with zero per-query failures and (b) produces
# outputs hash-identical to the clean run (tools/compare_dumps.py).
# Recovery evidence (FetchFailed / ExecutorLostFailure task ends,
# stage re-attempts, executor removals) is extracted from the event
# logs by tools/fault_report.py.
#
# Usage: fault_drill.sh [sfDir] [outBase]
set -uo pipefail

SF=${1:-/root/testdata/sf0.1}
OUT=${2:-/root/repo/target/fault_drill}
REPO=/root/repo
JAR=$REPO/target/scala-2.13/kusuma_metamorphetlspark_2.13-0.1.0.jar
EVDIR=$OUT/events
NS=sparkw2

# shuffle-heavy multi-family subset; excludes the documented
# single-JVM Derby fixture (red on any multi-process cluster)
QUERIES="q_minhash_lsh q_dedup_clusters_lsh q_dup_spans q_semantic_dedup \
q_bm25 q_classifier_pr q_ingest_funnel q_customer_sales_report \
q_supplier_performance q_tfidf q_events_sessions q_dsir_sample"

mkdir -p "$OUT" "$EVDIR"

submit() { # $1 = outdir, $2 = eventlog subdir
  mkdir -p "$EVDIR/$2"
  SPARK_GRAFT_MASTER=spark://10.200.0.1:7077 \
  SPARK_GRAFT_PG_HOST=10.200.0.1 \
  SPARK_GRAFT_REPO=$REPO \
  SPARK_GRAFT_CPUS=16 \
  SPARK_LOCAL_HOSTNAME=10.200.0.1 \
  /opt/spark/bin/spark-submit \
    --master spark://10.200.0.1:7077 \
    --conf spark.driver.host=10.200.0.1 \
    --conf spark.eventLog.enabled=true \
    --conf spark.eventLog.dir=$EVDIR/$2 \
    --conf spark.eventLog.compress=true \
    --conf spark.executor.memory=4g \
    --conf spark.network.timeout=60s \
    --conf spark.shuffle.io.connectionCreationTimeout=20s \
    --conf spark.shuffle.io.connectionTimeout=20s \
    --conf spark.shuffle.io.maxRetries=2 \
    --conf spark.shuffle.io.retryWait=5s \
    --jars $REPO/lib/postgresql-42.7.2.jar \
    --class graft.Verify "$JAR" "$SF" "$1" $QUERIES
}

echo "== cluster up"
"$REPO/tools/netns_cluster.sh" down >/dev/null 2>&1
"$REPO/tools/netns_cluster.sh" up

echo "== run 1/2: no-fault reference"
if [ ! -d "$OUT/base/q_tfidf" ]; then
  submit "$OUT/base" base > "$OUT/base.log" 2>&1
  grep "\[verify\].*failed" "$OUT/base.log" && { echo "BASE RUN RED"; exit 1; }
else
  echo "   (reusing existing no-fault reference)"
fi

echo "== run 2/2: fault-injected"
rm -rf "$OUT/fault"
submit "$OUT/fault" fault > "$OUT/fault.log" 2>&1 &
RUN=$!

# kill only processes whose NETWORK namespace is worker B's: netns
# does NOT isolate PIDs, so `ip netns exec $NS pkill -f pattern` scans
# the whole machine and kills worker A's processes too (measured: the
# second drill run killed BOTH workers this way and the app starved)
kill_in_ns() { # $1 = cmdline pattern
  for p in $(ip netns pids $NS 2>/dev/null); do
    tr '\0' ' ' < /proc/$p/cmdline 2>/dev/null | grep -q "$1" \
      && kill -9 $p 2>/dev/null
  done
  true
}

# fault 1: SIGKILL worker B's executor JVM once >=2 queries are done
# (mid-run by construction, not by timing guesses)
while [ "$(ls -d "$OUT"/fault/q_* 2>/dev/null | wc -l)" -lt "${THRESH1:-2}" ]; do
  kill -0 $RUN 2>/dev/null || break; sleep 2
done
echo "-- injecting: SIGKILL executor on worker B ($(ls -d "$OUT"/fault/q_* 2>/dev/null | wc -l) queries done)"
kill_in_ns CoarseGrainedExecutorBackend
date -u +"%T executor killed" >> "$OUT/injections.log"

# fault 2: once >=6 queries are done, lose the ENTIRE worker-B host:
# SIGKILL every Spark process in the namespace AND cut its wire from
# INSIDE (downing the ns end of the veth). The namespace itself is NOT
# deleted mid-run — that would tear down the veth PAIR and with it
# 10.200.0.1, the address the driver/master/worker A are bound to
# (measured: the first drill run hung exactly this way; you cannot
# "lose a host" by deleting the switch).
while [ "$(ls -d "$OUT"/fault/q_* 2>/dev/null | wc -l)" -lt "${THRESH2:-6}" ]; do
  kill -0 $RUN 2>/dev/null || break; sleep 2
done
echo "-- injecting: killing worker-B host (all processes + wire down)"
kill_in_ns "deploy.worker.Worker"
kill_in_ns CoarseGrainedExecutorBackend
ip netns exec $NS ip link set veth-sgn down 2>/dev/null || true
date -u +"%T worker-B processes killed + veth-sgn down" >> "$OUT/injections.log"

wait $RUN; RC=$?
echo "== fault run rc=$RC"
grep "\[verify\].*failed" "$OUT/fault.log" && { echo "FAULT RUN RED"; RC=1; }

echo "== hash compare (fault vs no-fault)"
python3 "$REPO/tools/compare_dumps.py" "$OUT/base" "$OUT/fault" \
  | tee "$OUT/compare.txt"
CMP=${PIPESTATUS[0]}

echo "== recovery evidence from event logs"
python3 "$REPO/tools/fault_report.py" "$EVDIR/fault" \
  | tee "$OUT/fault_report.json"
python3 "$REPO/tools/fault_report.py" "$EVDIR/base" \
  > "$OUT/base_report.json"

echo "== teardown"
"$REPO/tools/netns_cluster.sh" down >/dev/null 2>&1

if [ "$RC" = 0 ] && [ "$CMP" = 0 ]; then
  echo "FAULT DRILL PASS: run green under executor+host loss, outputs hash-identical"
else
  echo "FAULT DRILL FAIL: rc=$RC compare=$CMP"; exit 1
fi
