#!/usr/bin/env bash
# Package snowy_json_spark for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-/tmp/snowy_json_spark.zip}"
rm -f "$out"
zip -qr "$out" snowy_json_spark -x '*__pycache__*'
echo "$out"
