#!/usr/bin/env bash
# Ship the engine to a real cluster via spark-submit --py-files
# (BASELINE.json north_star: "ships via spark-submit --py-files").
#
# Usage:
#   scripts/spark_submit_bench.sh [spark-submit args...]
#
# On a cluster, replace --master with your resource manager
# (yarn / k8s://... / spark://...); bench.py honors SPARK_GRAFT_SF_DIR
# and SPARK_GRAFT_CPUS, and --synthetic N generates the deterministic
# web corpus on-cluster (no data shipping needed).
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/iresearch_spark_pyfiles.zip
rm -f "$ZIP"
# package the library only — bench.py is the driver script
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("/tmp/iresearch_spark_pyfiles.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("iresearch_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith((".py", ".txt")):
                p = os.path.join(root, f)
                z.write(p, p)
print("packaged -> /tmp/iresearch_spark_pyfiles.zip")
EOF

exec "${SPARK_HOME:-/opt/spark}/bin/spark-submit" \
  --master "${SPARK_MASTER:-local[32]}" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-32}" \
  "$@" \
  bench.py
