#!/usr/bin/env bash
# no7singing singing-voice vocoder recipe (24 kHz); stages shared with
# egs/common/run_stages.sh (reference egs/no7singing/voc1/run.sh).
cd "$(dirname "$0")"
conf=conf/hifigan.v1.yaml

download() {
    if [ ! -e "${db_root}/no7singing" ]; then
        echo "ERROR: no7singing does not exist." >&2
        echo "ERROR: Please download it from https://www.nana-music.com (no7singing, manual distribution)" >&2
        echo "ERROR: and locate it at ${db_root}/no7singing" >&2
        exit 1
    fi
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" \
        --wav-glob 'no7singing/wav/*.wav' --num-dev 3 --num-eval 3
}

source ../../common/run_stages.sh "$@"
