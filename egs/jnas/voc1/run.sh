#!/usr/bin/env bash
# JNAS (Japanese newspaper article sentences, 16 kHz, multi-speaker) vocoder
# recipe; stages shared with egs/common/run_stages.sh (reference
# egs/jnas/voc1/run.sh). JNAS is a licensed corpus and must be obtained from
# http://research.nii.ac.jp/src/en/JNAS.html manually.
cd "$(dirname "$0")"
conf=conf/parallel_wavegan.v1.yaml

download() {
    if [ ! -e "${db_root}/JNAS" ]; then
        echo "ERROR: JNAS data does not exist." >&2
        echo "ERROR: Please obtain it from http://research.nii.ac.jp/src/en/JNAS.html" >&2
        echo "ERROR: and locate it at ${db_root}/JNAS" >&2
        exit 1
    fi
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" \
        --wav-glob 'JNAS/WAVES_HS/*/NP/*.wav' \
        --spk-regex 'WAVES_HS/([^/]+)/' --num-dev 300 --num-eval 300
}

source ../../common/run_stages.sh "$@"
