#!/usr/bin/env bash
# pjs singing-voice vocoder recipe (24 kHz); stages shared with
# egs/common/run_stages.sh (reference egs/pjs/voc1/run.sh).
cd "$(dirname "$0")"
conf=conf/hifigan.v1.yaml

download() {
    if [ ! -e "${db_root}/PJS_corpus_ver1.1" ]; then
        echo "ERROR: PJS_corpus_ver1.1 does not exist." >&2
        echo "ERROR: Please download it from https://sites.google.com/site/shinnosuketakamichi/research-topics/pjs_corpus (authentication required)" >&2
        echo "ERROR: and locate it at ${db_root}/PJS_corpus_ver1.1" >&2
        exit 1
    fi
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" \
        --wav-glob 'PJS_corpus_ver1.1/pjs*/pjs*_song.wav' --num-dev 2 --num-eval 2
}

source ../../common/run_stages.sh "$@"
