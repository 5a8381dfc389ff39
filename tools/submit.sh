#!/usr/bin/env bash
# spark-submit wrapper: builds the --py-files zip and submits driver.py.
# Example: tools/submit.sh encode --rows 200000 --out /tmp/encoded
set -euo pipefail
cd "$(dirname "$0")/.."
ZIP=$(python tools/build_pyfiles.py)
MASTER=${SPARK_MASTER:-"local[${SPARK_GRAFT_CPUS:-32}]"}
exec spark-submit --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$ZIP" \
  driver.py "$@"
