#!/usr/bin/env bash
# Cluster entry point (north rule: "run via spark-submit --py-files on
# multi-executor clusters"). Packages the engine as a zip and submits the
# materialization job. In this sandbox there is no cluster manager, so
# master defaults to local[*]; on a real cluster pass e.g.
#   MASTER=yarn ./BENCH/run.sh <table_root> <dest> <start> <end>
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${MASTER:-local[*]}"
TABLE_ROOT="${1:?usage: run.sh <table_root> <dest> <start> <end>}"
DEST="${2:?dest}"
START="${3:?start}"
END="${4:?end}"

ZIP=/tmp/feast_spark.zip
rm -f "$ZIP"
python - <<PY
import zipfile, os
with zipfile.ZipFile("$ZIP", "w") as z:
    for root, _dirs, files in os.walk("feast_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("packaged", "$ZIP")
PY

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=2048 \
  --conf spark.buffer.pageSize=4m \
  BENCH/materialize_job.py "$TABLE_ROOT" "$DEST" "$START" "$END"
