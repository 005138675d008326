#!/bin/bash
# Build dist/ocr_spark.zip for spark-submit --py-files (north rule packaging).
#
#   bash tools/package.sh
#   spark-submit --py-files dist/ocr_spark.zip ocr_spark/cli.py extract \
#       --input /data/corpus --output /data/out --buckets 256
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p dist
rm -f dist/ocr_spark.zip
# package the library incl. the bundled alphabet sheet; no tests/tools
zip -qr dist/ocr_spark.zip ocr_spark -x 'ocr_spark/**/__pycache__/*' -x 'ocr_spark/__pycache__/*'
python3 - <<'EOF'
import zipfile
z = zipfile.ZipFile("dist/ocr_spark.zip")
names = z.namelist()
assert "ocr_spark/cli.py" in names and "ocr_spark/data/arial.gray.png" in names
assert "ocr_spark/data/courier.gray.png" in names  # --fonts courier must work from the zip
print(f"dist/ocr_spark.zip: {len(names)} entries")
EOF
