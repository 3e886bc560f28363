#!/bin/sh
# The pre-submit double sweep (run every round before the driver's
# verify): full DuckDB parity in BOTH parquet timestamp reading
# modes. Round 2's bench crashed on a window-over-unix_micros
# analysis error that only manifests when timestamps come back as
# TIMESTAMP_LTZ (the driver's session default) — this sweep is what
# catches that class locally.
#
# Usage: sh tools/ltz_sweep.sh [extra parity args...]
set -e
cd "$(dirname "$0")/.."
echo "== sweep 1/2: default timestamp mode =="
python tools/parity.py "$@"
echo "== sweep 2/2: LTZ mode (inferTimestampNTZ disabled) =="
SPARK_GRAFT_EXTRA_CONF="spark.sql.parquet.inferTimestampNTZ.enabled=false" \
    python tools/parity.py "$@"
echo "== both sweeps green =="
