#!/bin/sh
# Package unraveldocs_spark for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/unraveldocs_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/unraveldocs_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("unraveldocs_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/unraveldocs_spark.zip")
EOF
