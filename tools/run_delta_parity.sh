#!/usr/bin/env bash
# Delta / Iceberg backend parity run — for a machine WITH network
# access (this sandbox has none: no PyPI, no Maven Central, so the
# delta/iceberg halves of tests/test_table_format.py auto-skip here).
#
# What it does: installs the delta-spark Python package, then runs the
# SAME parity matrix (snapshot/time-travel, merge, schema evolution,
# compact+vacuum) against every backend whose runtime is present.
# Spark fetches the jars itself via spark.jars.packages on session
# build, so no manual jar management is needed.
#
# Version pinning: PySpark 4.x is Scala 2.13. Pick the delta-spark
# line matching the installed Spark minor (delta.io compatibility
# table) — 4.0.x for Spark 4.0; check the table for Spark 4.1.
set -euo pipefail
cd "$(dirname "$0")/.."

SPARK_MINOR=$(python -c "import pyspark; print('.'.join(pyspark.__version__.split('.')[:2]))")
DELTA_VERSION="${DELTA_VERSION:-4.0.0}"
ICEBERG_VERSION="${ICEBERG_VERSION:-1.9.0}"

pip install "delta-spark==${DELTA_VERSION}"

# The test module builds its session through
# bio_lakehouse_spark.session.get_spark, which honors these env vars
# (see session.py): extra packages + sql extensions + catalog conf.
export SPARK_GRAFT_EXTRA_PACKAGES="io.delta:delta-spark_2.13:${DELTA_VERSION},org.apache.iceberg:iceberg-spark-runtime-${SPARK_MINOR}_2.13:${ICEBERG_VERSION}"
export SPARK_GRAFT_SQL_EXTENSIONS="io.delta.sql.DeltaSparkSessionExtension,org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
export SPARK_GRAFT_ICEBERG_WAREHOUSE="${SPARK_GRAFT_ICEBERG_WAREHOUSE:-/tmp/iceberg-warehouse}"

python -m pytest tests/test_table_format.py -v
