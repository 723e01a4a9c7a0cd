#!/bin/bash
# Re-run the timed reps of scripts/submit_pipeline.sh over an
# ALREADY-PREPARED work dir (skips the input materialization) — used to
# retry the measurement when a rep set landed in a contended window.
# Usage: scripts/rerun_submit_reps.sh [workDir] [reps]
set -e
export SPARK_HOME=${SPARK_HOME:-/opt/spark}
export SPARK_SCALA_VERSION=2.13
HERE="$(cd "$(dirname "$0")" && pwd)"
WORK=${1:-/dev/shm/graft-submit}
REPS=${2:-3}
JAR="$HERE/../target/scala-2.13/dhtmlparserspark_2.13-0.1.0.jar"
MASTER=${SPARK_GRAFT_MASTER_URL:-spark://127.0.0.1:7077}
SUBMIT="$SPARK_HOME/bin/spark-submit"
[ -d "$WORK/transcripts" ] || { echo "no prepared input at $WORK" >&2; exit 1; }
rm -f "$WORK"/N.jsonl "$WORK"/N4.jsonl

WORKER_CORES=1 N_WORKERS=4 "$HERE/standalone_cluster.sh" start
trap '"$HERE/standalone_cluster.sh" stop >/dev/null 2>&1 || true' EXIT
sleep 3

run_one() {
  rm -rf "$WORK/out-$2-$3"
  "$SUBMIT" --master "$MASTER" --deploy-mode client \
    --driver-memory 8g --executor-memory 4g --executor-cores 1 \
    --total-executor-cores "$1" \
    --class graft.PipelineMain "$JAR" \
    run "$WORK/transcripts" "$WORK/out-$2-$3" extractfirst "$WORK/transcripts-warmup" \
    2>"$WORK/$2-$3.log" | tee -a "$WORK/$2.jsonl"
}

for r in $(seq 1 "$REPS"); do
  run_one 1 N  "$r"
  run_one 4 N4 "$r"
done

python3 - "$WORK" <<'EOF'
import json, sys, os
w = sys.argv[1]
def level(tag):
    rows = [json.loads(l) for l in open(os.path.join(w, tag + ".jsonl"))]
    best = max(rows, key=lambda r: r["turns_per_sec"])
    return best, [r["turns_per_sec"] for r in rows], [r["steal_pct"] for r in rows]
bn, tn, sn = level("N")
b4, t4, s4 = level("N4")
print(json.dumps({
    "metric": "spark-submit scaling efficiency (resumable pipeline, 1-core executors)",
    "value": round(b4["turns_per_sec"] / (4.0 * bn["turns_per_sec"]), 3),
    "unit": "ratio",
    "N_turns_per_sec": bn["turns_per_sec"],
    "N4_turns_per_sec": b4["turns_per_sec"],
    "N_wall_sec": round(bn["wall_sec"], 3), "N4_wall_sec": round(b4["wall_sec"], 3),
    "N_all_tps": tn, "N4_all_tps": t4,
    "N_steal_pct": sn, "N4_steal_pct": s4,
    "rows_per_run": bn["rows"]}))
EOF
