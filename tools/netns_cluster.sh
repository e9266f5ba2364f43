#!/bin/bash
# Two-"host" Spark standalone cluster with the second worker isolated in
# its own NETWORK NAMESPACE behind a veth pair — the closest thing to a
# second machine this single-VM harness can produce, and enough to
# exercise the network data plane for real: the namespaces share nothing
# but the veth wire, so every shuffle fetch, RPC, and JDBC connection
# between the root-namespace worker (10.200.0.1) and the namespaced
# worker (10.200.0.2) moves actual bytes through a network device with
# readable counters. Spark identifies hosts by SPARK_LOCAL_IP, so the
# two workers register as DIFFERENT hosts and the host-local shuffle
# disk-read shortcut (which zeroed remote-read in the co-hosted 2-worker
# smoke) cannot trigger between them.
#
# Usage: netns_cluster.sh up | down | status
# After `up`: submit with
#   SPARK_GRAFT_MASTER=spark://10.200.0.1:7077 and
#   --conf spark.driver.host=10.200.0.1 (spark-submit from the root ns).
set -euo pipefail

NS=sparkw2
HOST_IP=10.200.0.1
NS_IP=10.200.0.2
SUBNET=24
SPARK_HOME=${SPARK_HOME:-/opt/spark}
CLUSTER_DIR=${CLUSTER_DIR:-/root/repo/target/cluster}
CORES=${SPARK_GRAFT_WORKER_CORES:-8}
MEM=${SPARK_GRAFT_WORKER_MEM:-6g}

common_env() { # $1 = local ip, $2 = worker tag
  # SPARK_LOCAL_HOSTNAME pins the worker's HOST IDENTITY to its veth IP
  # (SPARK_LOCAL_IP alone only sets the bind address — both workers
  # would register as "localhost" and Spark would treat them as
  # co-hosted, re-enabling the host-local shuffle shortcut this
  # topology exists to defeat)
  echo "SPARK_LOCAL_IP=$1 SPARK_LOCAL_HOSTNAME=$1 \
    SPARK_LOG_DIR=$CLUSTER_DIR/logs \
    SPARK_PID_DIR=$CLUSTER_DIR/pid-$2 \
    SPARK_WORKER_DIR=$CLUSTER_DIR/work-$2 \
    SPARK_WORKER_CORES=$CORES SPARK_WORKER_MEMORY=$MEM \
    SPARK_NO_DAEMONIZE="
}

case "${1:-up}" in
up)
  mkdir -p "$CLUSTER_DIR"/{logs,events}
  # -- the wire --------------------------------------------------------
  ip netns list | grep -q "^$NS" || ip netns add $NS
  if ! ip link show veth-sgh >/dev/null 2>&1; then
    ip link add veth-sgh type veth peer name veth-sgn
    ip link set veth-sgn netns $NS
    ip addr add $HOST_IP/$SUBNET dev veth-sgh
    ip link set veth-sgh up
    ip netns exec $NS ip addr add $NS_IP/$SUBNET dev veth-sgn
    ip netns exec $NS ip link set veth-sgn up
    ip netns exec $NS ip link set lo up
  fi
  # wire sanity (no ping binary in this image — TCP-probe via bash)
  timeout 3 ip netns exec $NS bash -c \
    "until echo > /dev/tcp/$HOST_IP/22 2>/dev/null; do :; done" 2>/dev/null \
    || ip netns exec $NS ip route get $HOST_IP >/dev/null
  # -- master (root ns, bound to the veth address) ---------------------
  env $(common_env $HOST_IP master) SPARK_MASTER_HOST=$HOST_IP \
    nohup "$SPARK_HOME/sbin/start-master.sh" \
    > "$CLUSTER_DIR/logs/master.out" 2>&1 &
  sleep 3
  # -- worker A (root ns == "host 1") ----------------------------------
  env $(common_env $HOST_IP wa) \
    nohup "$SPARK_HOME/sbin/start-worker.sh" -p 35001 \
    spark://$HOST_IP:7077 > "$CLUSTER_DIR/logs/worker-a.out" 2>&1 &
  # -- worker B (network namespace == "host 2") ------------------------
  ip netns exec $NS env $(common_env $NS_IP wb) \
    nohup "$SPARK_HOME/sbin/start-worker.sh" -p 35002 \
    spark://$HOST_IP:7077 > "$CLUSTER_DIR/logs/worker-b.out" 2>&1 &
  sleep 4
  $0 status
  ;;
down)
  pkill -f "deploy.worker.Worker" 2>/dev/null || true
  pkill -f "deploy.master.Master" 2>/dev/null || true
  sleep 1
  ip link del veth-sgh 2>/dev/null || true
  ip netns del $NS 2>/dev/null || true
  echo "cluster down"
  ;;
status)
  echo "== veth counters (host side):"
  ip -s link show veth-sgh 2>/dev/null | sed -n '1,6p' || echo "  (no veth)"
  echo "== spark daemons:"
  pgrep -af "deploy.(master.Master|worker.Worker)" | sed 's/ -cp .*class / /' || echo "  none"
  ;;
*) echo "usage: $0 up|down|status" >&2; exit 2 ;;
esac
