#!/usr/bin/env bash
# Delta / Iceberg backend parity run.
#
# Two modes:
#
#   ONLINE (machine with PyPI + Maven reachability): installs the
#   delta-spark Python package and lets Spark fetch the jars itself
#   via spark.jars.packages on session build.
#
#   OFFLINE (air-gapped, r9): set SPARK_GRAFT_JARS_DIR to a directory
#   of pre-downloaded jars (delta-spark_2.13, delta-storage,
#   iceberg-spark-runtime, and their deps — collect them once on a
#   networked machine with e.g.
#     mvn dependency:copy -Dartifact=io.delta:delta-spark_2.13:4.0.0
#   or by tar-ing ~/.ivy2 after one online run). The session wires
#   them onto the classpath via spark.jars (see session.py). The
#   delta PYTHON package can likewise be vendored as a wheel:
#     pip download delta-spark==4.0.0 -d "$SPARK_GRAFT_JARS_DIR/py"
#     pip install --no-index --find-links "$SPARK_GRAFT_JARS_DIR/py" delta-spark
#   Iceberg needs no Python package — with jars alone, the Iceberg
#   half of the matrix runs.
#
# What it runs either way: the SAME parity matrix
# (snapshot/time-travel, merge, schema evolution, compact+vacuum)
# from tests/test_table_format.py against every backend whose
# runtime is present; absent backends auto-skip.
#
# Version pinning: PySpark 4.x is Scala 2.13. Pick the delta-spark
# line matching the installed Spark minor (delta.io compatibility
# table) — 4.0.x for Spark 4.0; check the table for Spark 4.1.
set -euo pipefail
cd "$(dirname "$0")/.."

SPARK_MINOR=$(python -c "import pyspark; print('.'.join(pyspark.__version__.split('.')[:2]))")
DELTA_VERSION="${DELTA_VERSION:-4.0.0}"
ICEBERG_VERSION="${ICEBERG_VERSION:-1.9.0}"

if [ -n "${SPARK_GRAFT_JARS_DIR:-}" ] && [ -d "${SPARK_GRAFT_JARS_DIR}" ]; then
    echo "offline mode: using jars from ${SPARK_GRAFT_JARS_DIR}" >&2
    if [ -d "${SPARK_GRAFT_JARS_DIR}/py" ]; then
        pip install --no-index --find-links "${SPARK_GRAFT_JARS_DIR}/py" \
            delta-spark || true
    fi
    # session.py picks up SPARK_GRAFT_JARS_DIR directly — do NOT set
    # spark.jars.packages (it would try Maven and fail air-gapped).
else
    pip install "delta-spark==${DELTA_VERSION}"
    # The test module builds its session through
    # bio_lakehouse_spark.session.get_spark, which honors these env
    # vars (see session.py): extra packages + sql extensions +
    # catalog conf.
    export SPARK_GRAFT_EXTRA_PACKAGES="io.delta:delta-spark_2.13:${DELTA_VERSION},org.apache.iceberg:iceberg-spark-runtime-${SPARK_MINOR}_2.13:${ICEBERG_VERSION}"
fi

export SPARK_GRAFT_SQL_EXTENSIONS="io.delta.sql.DeltaSparkSessionExtension,org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
export SPARK_GRAFT_ICEBERG_WAREHOUSE="${SPARK_GRAFT_ICEBERG_WAREHOUSE:-/tmp/iceberg-warehouse}"

python -m pytest tests/test_table_format.py -v 2>&1 | tee "${DELTA_PARITY_LOG:-/tmp/delta_parity.log}"
echo "parity log written to ${DELTA_PARITY_LOG:-/tmp/delta_parity.log}" >&2
