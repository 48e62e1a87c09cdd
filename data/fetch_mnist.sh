#!/usr/bin/env bash
# Download raw MNIST IDX files into data/mnist/ (reference data/fetch_*.sh analog).
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p mnist && cd mnist
BASE=https://ossci-datasets.s3.amazonaws.com/mnist
for f in train-images-idx3-ubyte train-labels-idx1-ubyte \
         t10k-images-idx3-ubyte t10k-labels-idx1-ubyte; do
    if [ ! -f "$f" ]; then
        echo "fetching $f ..."
        curl -fsSLO "$BASE/$f.gz"
        gunzip -f "$f.gz"
    fi
done
echo "MNIST ready in $(pwd)"
