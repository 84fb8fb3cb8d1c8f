#!/usr/bin/env bash
# Package the engine for cluster submission:
#   ./scripts/build_zip.sh            → dist/hipporag_spark.zip
#   spark-submit --py-files dist/hipporag_spark.zip scripts/submit_ppr.py ...
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/hipporag_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/hipporag_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("hipporag_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/hipporag_spark.zip")
EOF
