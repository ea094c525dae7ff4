#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north rule).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/kg_engine.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/kg_engine.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("dss_plugin_nlp_analysis_spark/**/*.py")):
        z.write(p, p.as_posix())
print("wrote dist/kg_engine.zip")
EOF
