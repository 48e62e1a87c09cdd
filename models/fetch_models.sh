#!/usr/bin/env bash
# Fetch (or regenerate) the published pretrained model bundle.
#
# Analog of the reference's models/fetch_models.sh (a Google-Drive download
# of trained TF checkpoints).  Checkpoints in this framework are plain
# directories of {params.json, model.npz, random_state.json}, so the bundle
# is a tar.gz of model directories.
#
# Modes:
#   1. BMT_MODELS_URL set  -> download + extract the bundle from that URL.
#   2. no URL / no egress  -> regenerate every model locally by running the
#      example pipelines (each stage is cached by directory existence, so
#      re-runs are incremental).  Pass --quick to train the MNIST models
#      only (the CIFAR pipelines take ~30 min on one chip).
set -euo pipefail
cd "$(dirname "$0")"

if [[ -n "${BMT_MODELS_URL:-}" ]]; then
    echo "downloading model bundle from ${BMT_MODELS_URL} ..."
    curl -L "${BMT_MODELS_URL}" -o bmt_models.tar.gz
    tar xzf bmt_models.tar.gz
    rm -f bmt_models.tar.gz
    echo "done; models:"
    ls -d */ 2>/dev/null
    exit 0
fi

echo "BMT_MODELS_URL not set (or no egress) -- regenerating models locally"
echo "via the example pipelines.  Stages cached in this directory are skipped."
# run from examples/ -- the example scripts' default model/data paths
# ('../models/...', '../data/...') are relative to that directory
cd ../examples
python rbm_mnist.py
python dbm_mnist.py
if [[ "${1:-}" != "--quick" ]]; then
    python dbm_cifar_naive.py
    python dbm_cifar.py
fi
