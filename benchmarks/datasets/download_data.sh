#!/usr/bin/env bash
# Fetch the 16 preprocessed UEA-style .mat archives used by the benchmark
# harness (reference: benchmarks/datasets/download_data.sh — a Dropbox
# AllDatasets.zip). Run from this directory:
#
#   bash download_data.sh [TARGET_DIR]
#
# Each .mat carries X_train/y_train/X_test/y_test as ragged object arrays
# (see gpsig_tpu/datasets.py for the exact layout contract).
#
# If the Dropbox bundle is gone, the loader also reads the UEA archive's
# native .ts format — extract Multivariate_ts.zip from
# timeseriesclassification.com into this directory instead (each dataset
# in its own subdirectory; no conversion needed).
#
# In a zero-egress environment this script cannot run; generate the
# deterministic synthetic stand-ins instead, which exercise the identical
# code path end-to-end:
#
#   python make_synthetic.py
set -euo pipefail

DATA_DIR="${1:-.}"
URL="https://www.dropbox.com/sh/jqy6519ogx0ool3/AADyDdCPTZCj3QQbGXrYNjiua/AllDatasets.zip?dl=1"
ZIP="${DATA_DIR}/AllDatasets.zip"

mkdir -p "${DATA_DIR}"

if command -v wget >/dev/null 2>&1; then
    wget -O "${ZIP}" "${URL}"
elif command -v curl >/dev/null 2>&1; then
    curl -L -o "${ZIP}" "${URL}"
else
    echo "error: need wget or curl" >&2
    exit 1
fi

unzip -o "${ZIP}" -d "${DATA_DIR}"
rm -f "${ZIP}"

echo "Datasets in ${DATA_DIR}:"
ls "${DATA_DIR}"/*.mat
