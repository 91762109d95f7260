#!/bin/sh
# Build the --py-files artifact for spark-submit cluster deployment.
set -e
cd "$(dirname "$0")/.."
rm -f dist/linkgraph.zip
mkdir -p dist
zip -qr dist/linkgraph.zip linkgraph -x "*/__pycache__/*"
echo "dist/linkgraph.zip:"
unzip -l dist/linkgraph.zip | tail -2
