#!/usr/bin/env bash
# Build the --py-files zip for spark-submit.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/wordscape_spark.zip
zip -qr dist/wordscape_spark.zip wordscape_spark -x '*__pycache__*'
echo "dist/wordscape_spark.zip"
