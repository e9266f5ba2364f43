#!/bin/bash
# STREAMING CRASH-RECOVERY DRILL: SIGKILL the driver JVM mid-micro-batch
# (twice, at different points) and assert the three checkpointed streaming
# queries — jsonlIngest's good/quarantine split and the watermarked daily
# aggregation — resume to EXACTLY-ONCE output: row-identical to a batch
# re-parse of the same feed AND hash-identical to a no-fault streaming run.
# Also records the crash evidence: orphaned parquet parts on disk that the
# _spark_metadata manifest hides from readers, and per-checkpoint batch
# counts across the kills.
#
# This is the streaming member of the operational-drill family
# (fault_drill.sh = batch under executor/host loss, spill_drill.sh = batch
# under memory pressure): graceful stop/restart is spec'd in
# EventStreamSpec; only a process SIGKILL exercises the offset WAL +
# state-store + manifest recovery path for real.
#
# Usage: stream_crash_drill.sh [sfDir] [outBase]
#   KILL_AT_BATCHES="2 2"  SIGKILL roll N once ck_good has committed that
#                          many NEW offsets since the roll started (the
#                          kill is condition-fired, not a timer, so it is
#                          guaranteed to land mid-stream)
#   FEED_MS=250            drip-feed interval per chunk
set -uo pipefail

SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/root/repo/target/stream_crash_drill}
REPO=/root/repo
JAR=$REPO/target/scala-2.13/kusuma_metamorphetlspark_2.13-0.1.0.jar
KILL_AT_BATCHES=${KILL_AT_BATCHES:-"2 2"}
FEED_MS=${FEED_MS:-250}

[ -f "$JAR" ] || { echo "jar missing — run: sbt package"; exit 1; }
rm -rf "$OUT"; mkdir -p "$OUT"

submit() { # $1 = phase, $2 = workdir, extra args after
  local phase=$1 work=$2; shift 2
  SPARK_GRAFT_CPUS=8 SPARK_GRAFT_REPO=$REPO \
  /opt/spark/bin/spark-submit --master 'local[8]' \
    --driver-memory 4g \
    --class graft.StreamCrashDrill "$JAR" "$phase" "$SF" "$work" "$@"
}

batches() { # offsets committed per checkpoint
  for ck in ck_good ck_bad ck_daily; do
    printf "%s=%s " "$ck" "$(ls "$1/$ck/offsets" 2>/dev/null | wc -l)"
  done; echo
}

# ---- arm 1: no-fault reference ------------------------------------------
NF=$OUT/nofault
echo "== no-fault arm"
submit init "$NF" > "$OUT/nf_init.log" 2>&1 || { echo INIT FAIL; exit 1; }
submit serve "$NF" "$FEED_MS" > "$OUT/nf_serve.log" 2>&1 \
  || { echo NO-FAULT SERVE FAIL; tail "$OUT/nf_serve.log"; exit 1; }
submit check "$NF" > "$OUT/nf_check.log" 2>&1
NF_RC=$?
grep '\[drill\]' "$OUT/nf_check.log" | tail -6
echo "no-fault batches: $(batches "$NF")"

# ---- arm 2: crash arm — two SIGKILLs, then resume to completion ---------
CR=$OUT/crash
echo "== crash arm (kill after new batches: $KILL_AT_BATCHES)"
submit init "$CR" > "$OUT/cr_init.log" 2>&1
ROLL=0
KILLED=0
for n in $KILL_AT_BATCHES; do
  ROLL=$((ROLL+1))
  BASE=$(ls "$CR/ck_good/offsets" 2>/dev/null | wc -l)
  submit serve "$CR" "$FEED_MS" > "$OUT/cr_serve_$ROLL.log" 2>&1 &
  PID=$!
  # condition-fired kill: wait for n NEW committed offsets in ck_good,
  # then SIGKILL while the stream is demonstrably mid-flight
  for _ in $(seq 1 600); do
    [ -f "$CR/SERVED" ] && break
    CUR=$(ls "$CR/ck_good/offsets" 2>/dev/null | wc -l)
    [ $((CUR - BASE)) -ge "$n" ] && break
    sleep 0.2
  done
  if [ -f "$CR/SERVED" ]; then
    echo "WARN roll $ROLL: serve finished before +$n batches — kill skipped"
    wait "$PID"; continue
  fi
  # spark-submit exec's the driver JVM, so $PID IS the java process
  kill -9 "$PID" 2>/dev/null
  wait "$PID" 2>/dev/null
  KILLED=$((KILLED+1))
  echo "roll $ROLL: SIGKILL after +$n batches; batches so far: $(batches "$CR")"
done
[ "$KILLED" -ge 1 ] || { echo "no kill ever landed — drill vacuous"; exit 1; }
echo "== resume to completion"
submit serve "$CR" "$FEED_MS" > "$OUT/cr_serve_final.log" 2>&1 \
  || { echo RESUME SERVE FAIL; tail "$OUT/cr_serve_final.log"; exit 1; }
[ -f "$CR/SERVED" ] || { echo "resume never completed"; exit 1; }
echo "crash-arm batches: $(batches "$CR")"

submit check "$CR" > "$OUT/cr_check.log" 2>&1
CR_RC=$?
grep '\[drill\]' "$OUT/cr_check.log" | tail -6

# ---- arm 3 (CLUSTER=1, default): executor loss during streaming ----------
# serve runs on the netns two-"host" cluster and worker B's executor JVM
# is SIGKILLed mid-stream — the failure mode the driver-kill arms cannot
# reach: streaming STATE-STORE partitions die with the executor and the
# replacement tasks must reload them from the checkpoint, inside a live
# query, with no driver restart. Evidence from the event logs
# (fault_report.py) + the same exactly-once/hash verdicts.
CLUSTER=${CLUSTER:-1}
EX_RC=0
H_EX=""
if [ "$CLUSTER" = 1 ]; then
  EX=$OUT/execloss
  NS=sparkw2
  echo "== executor-loss arm (netns cluster)"
  "$REPO/tools/netns_cluster.sh" down >/dev/null 2>&1
  "$REPO/tools/netns_cluster.sh" up >/dev/null 2>&1 \
    || { echo "netns cluster failed to start"; exit 1; }
  mkdir -p "$EX/events"
  submit_cluster() { # $1 = phase, extra args after
    local phase=$1; shift
    SPARK_GRAFT_MASTER=spark://10.200.0.1:7077 \
    SPARK_GRAFT_REPO=$REPO SPARK_GRAFT_CPUS=16 \
    SPARK_LOCAL_HOSTNAME=10.200.0.1 \
    /opt/spark/bin/spark-submit --master spark://10.200.0.1:7077 \
      --conf spark.driver.host=10.200.0.1 \
      --conf spark.executor.memory=4g \
      --conf spark.eventLog.enabled=true \
      --conf spark.eventLog.dir=$EX/events \
      --conf spark.eventLog.compress=true \
      --class graft.StreamCrashDrill "$JAR" "$phase" "$SF" "$EX" "$@"
  }
  kill_in_ns() { # kill only PIDs whose network namespace is worker B's
    for p in $(ip netns pids $NS 2>/dev/null); do
      tr '\0' ' ' < /proc/$p/cmdline 2>/dev/null | grep -q "$1" \
        && kill -9 "$p" 2>/dev/null
    done
    true
  }
  submit_cluster init > "$OUT/ex_init.log" 2>&1
  submit_cluster serve "$FEED_MS" > "$OUT/ex_serve.log" 2>&1 &
  EPID=$!
  for _ in $(seq 1 600); do
    [ -f "$EX/SERVED" ] && break
    CUR=$(ls "$EX/ck_good/offsets" 2>/dev/null | wc -l)
    [ "$CUR" -ge 2 ] && break
    sleep 0.2
  done
  if [ -f "$EX/SERVED" ]; then
    echo "WARN: cluster serve finished before the executor kill"
  else
    kill_in_ns CoarseGrainedExecutorBackend
    echo "executor on worker B SIGKILLed mid-stream" \
         "(ck_good offsets: $(ls "$EX/ck_good/offsets" | wc -l))"
  fi
  wait "$EPID"; EX_SERVE_RC=$?
  [ -f "$EX/SERVED" ] || { echo "cluster serve never completed"; EX_SERVE_RC=1; }
  echo "executor-loss batches: $(batches "$EX")"
  # check runs locally — the sinks/checkpoints are plain local FS paths
  submit "check" "$EX" > "$OUT/ex_check.log" 2>&1
  EX_RC=$?
  [ "$EX_SERVE_RC" = 0 ] || EX_RC=1
  grep '\[drill\]' "$OUT/ex_check.log" | tail -6
  python3 "$REPO/tools/fault_report.py" "$EX/events" \
    | tee "$OUT/ex_fault_report.json"
  "$REPO/tools/netns_cluster.sh" down >/dev/null 2>&1
  H_EX=$(grep -o 'hash [a-z]*=[0-9a-f]*' "$OUT/ex_check.log" | sort)
fi

# ---- verdict -------------------------------------------------------------
# exactly-once vs batch reference in every arm, and all streaming runs
# byte-agree with each other (sink content is crash-invariant)
H_NF=$(grep -o 'hash [a-z]*=[0-9a-f]*' "$OUT/nf_check.log" | sort)
H_CR=$(grep -o 'hash [a-z]*=[0-9a-f]*' "$OUT/cr_check.log" | sort)
HASH_EQ=yes
[ "$H_NF" = "$H_CR" ] || HASH_EQ=no
if [ "$CLUSTER" = 1 ] && [ "$H_NF" != "$H_EX" ]; then HASH_EQ=no; fi
if [ "$NF_RC" = 0 ] && [ "$CR_RC" = 0 ] && [ "$EX_RC" = 0 ] \
   && [ -n "$H_NF" ] && [ "$HASH_EQ" = yes ]; then
  echo "STREAM CRASH DRILL PASS: exactly-once after $KILLED driver" \
       "SIGKILLs$([ "$CLUSTER" = 1 ] && echo ' + 1 executor kill on the cluster');" \
       "all arms hash-equal (3/3 sinks)"
else
  echo "STREAM CRASH DRILL FAIL: nf_rc=$NF_RC cr_rc=$CR_RC ex_rc=$EX_RC hash_eq=$HASH_EQ"
  exit 1
fi
