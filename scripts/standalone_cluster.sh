#!/bin/bash
# Pinned standalone Spark cluster for scaling evidence: one master +
# 4 workers, each worker taskset-pinned to a DISJOINT 4-core set
# (cpus 0-3, 4-7, 8-11, 12-15). Executors inherit the worker's cpuset,
# so an N=1 run cannot borrow the other 28 cores — the closest
# single-box proxy for per-node CPU isolation. The driver (sbt) runs
# unpinned on the remaining cores.
#
# Usage: scripts/standalone_cluster.sh start|stop
set -e
export SPARK_HOME=${SPARK_HOME:-/opt/spark}
export SPARK_SCALA_VERSION=2.13
export SPARK_NO_DAEMONIZE=""
MASTER_URL="spark://127.0.0.1:7077"
PIDDIR=/dev/shm/graft-standalone
LOGDIR=$PIDDIR/logs

# WORKER_CORES (default 4) and N_WORKERS (default 4) size the workers;
# WORKER_CORES=1 gives four 1-core workers pinned to cpus 0..3 — the
# under-the-host-ceiling shape (see BENCH/BASELINE.md) WITH hard cpuset
# isolation.
WORKER_CORES=${WORKER_CORES:-4}
N_WORKERS=${N_WORKERS:-4}

start() {
  mkdir -p "$LOGDIR"
  "$SPARK_HOME/bin/spark-class" org.apache.spark.deploy.master.Master \
    --host 127.0.0.1 --port 7077 --webui-port 8089 \
    > "$LOGDIR/master.log" 2>&1 &
  echo $! > "$PIDDIR/master.pid"
  sleep 3
  for i in $(seq 0 $((N_WORKERS - 1))); do
    lo=$((i * WORKER_CORES)); hi=$((lo + WORKER_CORES - 1))
    SPARK_LOCAL_DIRS=/dev/shm/graft-spark-w$i \
    taskset -c "$lo-$hi" \
      "$SPARK_HOME/bin/spark-class" org.apache.spark.deploy.worker.Worker \
      --cores "$WORKER_CORES" --memory 6g --port $((11000 + i)) --webui-port $((8090 + i)) \
      --work-dir "$PIDDIR/w$i" "$MASTER_URL" \
      > "$LOGDIR/worker$i.log" 2>&1 &
    echo $! >> "$PIDDIR/workers.pid"
  done
  sleep 4
  echo "cluster up: $MASTER_URL ($N_WORKERS workers x $WORKER_CORES cores, pinned)"
}

stop() {
  [ -f "$PIDDIR/workers.pid" ] && kill $(cat "$PIDDIR/workers.pid") 2>/dev/null || true
  [ -f "$PIDDIR/master.pid" ] && kill $(cat "$PIDDIR/master.pid") 2>/dev/null || true
  sleep 1
  pkill -f "org.apache.spark.deploy.worker.Worker" 2>/dev/null || true
  pkill -f "org.apache.spark.deploy.master.Master" 2>/dev/null || true
  rm -rf "$PIDDIR"
  echo "cluster stopped"
}

case "$1" in
  start) start ;;
  stop) stop ;;
  *) echo "usage: $0 start|stop"; exit 1 ;;
esac
