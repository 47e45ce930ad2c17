#!/usr/bin/env bash
# kiritan singing-voice vocoder recipe (24 kHz); stages shared with
# egs/common/run_stages.sh (reference egs/kiritan/voc1/run.sh).
cd "$(dirname "$0")"
conf=conf/hifigan.v1.yaml

download() {
    if [ ! -e "${db_root}/kiritan_singing" ]; then
        echo "ERROR: kiritan_singing does not exist." >&2
        echo "ERROR: Please download it from https://zunko.jp/kiridev/login.php (authentication required)" >&2
        echo "ERROR: and locate it at ${db_root}/kiritan_singing" >&2
        exit 1
    fi
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" \
        --wav-glob 'kiritan_singing/wav/*.wav' --num-dev 3 --num-eval 3
}

source ../../common/run_stages.sh "$@"
