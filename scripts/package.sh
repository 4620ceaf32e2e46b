#!/bin/sh
# Package the library for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/mircv_project_spark.zip
zip -qr dist/mircv_project_spark.zip mircv_project_spark \
    -x "*/__pycache__/*"
echo "dist/mircv_project_spark.zip"
