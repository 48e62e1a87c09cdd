#!/usr/bin/env bash
# Download CIFAR-10 python pickle batches into data/cifar-10-batches-py/.
set -euo pipefail
cd "$(dirname "$0")"
if [ ! -d cifar-10-batches-py ]; then
    echo "fetching CIFAR-10 ..."
    curl -fsSLO https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz
    tar xzf cifar-10-python.tar.gz
    rm -f cifar-10-python.tar.gz
fi
echo "CIFAR-10 ready in $(pwd)/cifar-10-batches-py"
