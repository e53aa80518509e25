#!/bin/sh
# Build dist/cgr_spark.zip for `spark-submit --py-files`.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/cgr_spark.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/cgr_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted((root / "code_graph_rag_spark").rglob("*.py")):
        z.write(p, p.as_posix())
print("wrote dist/cgr_spark.zip")
EOF
