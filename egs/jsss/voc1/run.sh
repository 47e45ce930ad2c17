#!/usr/bin/env bash
# JSSS (Japanese speech corpus for summarization and simplification, 24 kHz)
# vocoder recipe; stages shared with egs/common/run_stages.sh (reference
# egs/jsss/voc1/run.sh). The corpus is distributed via Google Drive with
# authentication (https://sites.google.com/site/shinnosuketakamichi/research-topics/jsss_corpus).
cd "$(dirname "$0")"
conf=conf/parallel_wavegan.v1.yaml

download() {
    if [ ! -e "${db_root}/jsss_ver1" ]; then
        echo "ERROR: jsss_ver1 does not exist." >&2
        echo "ERROR: Please download it from" >&2
        echo "ERROR: https://sites.google.com/site/shinnosuketakamichi/research-topics/jsss_corpus" >&2
        echo "ERROR: and locate it at ${db_root}/jsss_ver1" >&2
        exit 1
    fi
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" \
        --wav-glob 'jsss_ver1/*/wav24kHz16bit/*.wav' --num-dev 50 --num-eval 50
}

source ../../common/run_stages.sh "$@"
