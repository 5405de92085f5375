# Deployment packaging parity with the reference's two-stage build
# (reference Dockerfile:1-40: golang builder stage -> alpine runtime
# with config.yaml + credentials). The Spark-native analogue: a wheel
# build stage, then the official Apache Spark runtime image, with the
# app submitted through spark-submit so the SAME image serves both
# local-mode and cluster (k8s/standalone) deployments.
#
#   docker build -t gcs2postgres-spark .
#   docker run --rm \
#     -v $PWD/config.yaml:/app/config.yaml:ro \
#     -v $PWD/sa.json:/secrets/sa.json:ro \
#     -v $PWD/out:/app/out \
#     gcs2postgres-spark
#
# Cluster submission (the image as executor+driver template) is in
# deploy/spark-submit.sh.

# ---- Stage 1: build the wheel -------------------------------------------
FROM python:3.11-slim AS builder

WORKDIR /build

COPY pyproject.toml README.md ./
COPY gcs2postgres_spark/ ./gcs2postgres_spark/

RUN pip install --no-cache-dir build && python -m build --wheel --outdir /dist

# ---- Stage 2: Spark runtime ---------------------------------------------
# Official Apache Spark image, python3 variant (the documented alias
# pattern: 4.0.0 / 4.0.0-python3; java-qualified aliases vary by
# release, so the unqualified python3 tag is the stable spelling).
FROM apache/spark:4.0.0-python3

USER root
WORKDIR /app

# The wheel carries the engine; pyspark itself comes from $SPARK_HOME
# (never pip-install pyspark into a Spark image — a second copy shadows
# the cluster's and breaks version lockstep).
COPY --from=builder /dist/*.whl /tmp/
RUN pip install --no-cache-dir /tmp/*.whl && rm /tmp/*.whl

# Same runtime contract as the reference image: config.yaml baked in
# (override by bind-mount), credentials always MOUNTED, never baked —
# the reference copies sa.json into its image (reference Dockerfile:35);
# here /secrets/sa.json is the documented mount point instead so the
# image stays secret-free and registry-safe.
COPY config.yaml /app/config.yaml

# GCS + BigQuery connector jars resolve at submit time from public
# Maven via --packages (see deploy/spark-submit.sh); baking them in is
# also fine for air-gapped registries:
#   RUN $SPARK_HOME/bin/spark-shell --packages \
#     com.google.cloud.bigdataoss:gcs-connector:hadoop3-2.2.21 -e 1 \
#     && cp ~/.ivy2/jars/*.jar $SPARK_HOME/jars/

COPY deploy/run.py /app/run.py

# Service-account auth: mount the key at /secrets/sa.json and pass
# --gcs-keyfile /secrets/sa.json (wires
# sources/gcs.py::gcs_connector_conf into the session's Hadoop conf).
ENTRYPOINT ["/opt/spark/bin/spark-submit", \
    "--master", "local[*]", \
    "--packages", "com.google.cloud.bigdataoss:gcs-connector:hadoop3-2.2.21,com.google.cloud.spark:spark-bigquery-with-dependencies_2.13:0.42.0,org.postgresql:postgresql:42.7.4", \
    "/app/run.py"]
CMD ["--config", "/app/config.yaml", "--sink-dir", "/app/out"]
