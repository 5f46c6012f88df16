#!/usr/bin/env bash
# N -> 4N *executor* scaling on a real Spark standalone cluster
# (separate master / worker / executor JVMs — the closest local
# substitute for "N and 4N executors" in the north rule).
#
# Usage: bash scripts/run_cluster_scaling.sh [n_docs]
# Prints CLUSTER lines for 2 and 8 single-core executors and the
# resulting (T_N / T_4N) / 4 efficiency.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
SPARK_BIN="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin"))')"
N_DOCS="${1:-500000}"
CORPUS=/tmp/tos_cluster_corpus
MASTER_URL=spark://127.0.0.1:7077

cleanup() {
  pkill -f "org.apache.spark.deploy.worker.Worker" 2>/dev/null || true
  pkill -f "org.apache.spark.deploy.master.Master" 2>/dev/null || true
}
trap cleanup EXIT

echo "building ${N_DOCS}-doc corpus..."
python - <<EOF
import sys; sys.path.insert(0, "$REPO")
import bench
spark = bench._mk_session(8)
bench.build_scale_corpus(spark, "/root/testdata/sf0.1", "$CORPUS", $N_DOCS)
spark.stop()
EOF

echo "starting master + 8 workers (4 cores each)..."
nohup "$SPARK_BIN/spark-class" org.apache.spark.deploy.master.Master \
  --host 127.0.0.1 --port 7077 --webui-port 8089 >/tmp/tos-master.log 2>&1 &
sleep 10
for i in $(seq 1 8); do
  nohup "$SPARK_BIN/spark-class" org.apache.spark.deploy.worker.Worker \
    "$MASTER_URL" --cores 4 --memory 12g --port $((41000 + i)) \
    --webui-port $((8200 + i)) --work-dir "/tmp/tos-worker-$i" \
    >"/tmp/tos-worker-$i.log" 2>&1 &
done
sleep 12

python "$REPO/scripts/make_submit_zip.py" >/dev/null
declare -A T
for CORES in 2 8; do
  OUT=$("$SPARK_BIN/spark-submit" --master "$MASTER_URL" \
    --conf spark.executor.cores=1 --conf spark.executor.memory=3g \
    --conf spark.cores.max=$CORES \
    --py-files "$REPO/dist/table_ocr_spark.zip" \
    "$REPO/scripts/cluster_scaling.py" "$CORPUS" "$N_DOCS" 2>/dev/null | grep CLUSTER)
  echo "$OUT"
  T[$CORES]=$(echo "$OUT" | awk '{print $3}')
done

python - <<EOF
t2, t8 = ${T[2]}, ${T[8]}
print(f"executor scaling efficiency (T_2exec / T_8exec) / 4 = {(t2 / t8) / 4:.3f}")
EOF
