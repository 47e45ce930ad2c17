#!/usr/bin/env bash
# KSS (Korean single-speaker, 44.1 kHz) vocoder recipe; stages shared with
# egs/common/run_stages.sh (reference egs/kss/voc1/run.sh). KSS is
# distributed via Kaggle (https://www.kaggle.com/datasets/bryanpark/korean-single-speaker-speech-dataset).
cd "$(dirname "$0")"
conf=conf/melgan.v3.yaml

download() {
    if [ ! -d "${db_root}/kss" ]; then
        echo "ERROR: kss data does not exist." >&2
        echo "ERROR: Please download it from" >&2
        echo "ERROR: https://www.kaggle.com/datasets/bryanpark/korean-single-speaker-speech-dataset" >&2
        echo "ERROR: and locate it at ${db_root}/kss" >&2
        exit 1
    fi
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" \
        --wav-glob 'kss/*/*.wav' --num-dev 250 --num-eval 250
}

source ../../common/run_stages.sh "$@"
