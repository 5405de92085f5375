#!/usr/bin/env bash
# Cluster submission recipe (deployment parity with the reference's
# single-binary container, re-expressed for a Spark cluster).
#
# The same image built by ./Dockerfile serves as driver and executor
# template; this script shows the three deployment shapes. All
# connector coordinates and property names come from
# gcs2postgres_spark/sources/gcs.py (gcs_connector_conf /
# bigquery_read_options) — keep them in lockstep.
set -euo pipefail

IMAGE="${IMAGE:-gcs2postgres-spark:latest}"
CONFIG="${CONFIG:-/app/config.yaml}"
KEYFILE="${KEYFILE:-/secrets/sa.json}"
GCS_PROJECT="${GCS_PROJECT:-}"

PACKAGES="com.google.cloud.bigdataoss:gcs-connector:hadoop3-2.2.21"
PACKAGES+=",com.google.cloud.spark:spark-bigquery-with-dependencies_2.13:0.42.0"
PACKAGES+=",org.postgresql:postgresql:42.7.4"

# The spark.hadoop.* auth/project conf that sources/gcs.py assembles,
# spelled out for spark-submit --conf form:
GCS_CONF=(
  --conf "spark.hadoop.fs.gs.impl=com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem"
  --conf "spark.hadoop.fs.AbstractFileSystem.gs.impl=com.google.cloud.hadoop.fs.gcs.GoogleHadoopFS"
  --conf "spark.hadoop.google.cloud.auth.service.account.enable=true"
  --conf "spark.hadoop.google.cloud.auth.service.account.json.keyfile=${KEYFILE}"
)
if [[ -n "${GCS_PROJECT}" ]]; then
  GCS_CONF+=(--conf "spark.hadoop.fs.gs.project.id=${GCS_PROJECT}")
fi

MODE="${1:-local}"

case "${MODE}" in
  local)
    # Single-node (same semantics the tests run under local[32]).
    exec spark-submit \
      --master "local[*]" \
      --packages "${PACKAGES}" \
      "${GCS_CONF[@]}" \
      deploy/run.py --config "${CONFIG}" --gcs-keyfile "${KEYFILE}"
    ;;
  k8s)
    # Kubernetes: the image carries the wheel; executors scale out.
    # Shuffle sizing at cluster scale: 2-3x total executor cores
    # (SPARK_GRAFT_SHUFFLE_PARTITIONS env or spark.sql.shuffle.partitions),
    # AQE coalesces down at runtime.
    : "${K8S_MASTER:?set K8S_MASTER=k8s://https://<apiserver>:6443}"
    exec spark-submit \
      --master "${K8S_MASTER}" \
      --deploy-mode cluster \
      --name gcs2postgres-spark \
      --packages "${PACKAGES}" \
      "${GCS_CONF[@]}" \
      --conf spark.kubernetes.container.image="${IMAGE}" \
      --conf spark.executor.instances="${EXECUTORS:-8}" \
      --conf spark.executor.cores="${EXECUTOR_CORES:-4}" \
      --conf spark.executor.memory="${EXECUTOR_MEM:-8g}" \
      --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-96}" \
      --conf spark.kubernetes.driver.secrets.gcs-sa=/secrets \
      --conf spark.kubernetes.executor.secrets.gcs-sa=/secrets \
      local:///app/run.py --config "${CONFIG}" --jdbc --gcs-keyfile "${KEYFILE}"
    ;;
  standalone)
    : "${SPARK_MASTER:?set SPARK_MASTER=spark://<host>:7077}"
    exec spark-submit \
      --master "${SPARK_MASTER}" \
      --packages "${PACKAGES}" \
      "${GCS_CONF[@]}" \
      deploy/run.py --config "${CONFIG}" --jdbc --gcs-keyfile "${KEYFILE}"
    ;;
  *)
    echo "usage: $0 [local|k8s|standalone]" >&2
    exit 64
    ;;
esac
