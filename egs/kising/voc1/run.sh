#!/usr/bin/env bash
# kising singing-voice vocoder recipe (24 kHz); stages shared with
# egs/common/run_stages.sh (reference egs/kising/voc1/run.sh).
cd "$(dirname "$0")"
conf=conf/hifigan.v1.yaml

download() {
    if [ ! -e "${db_root}/KiSing" ]; then
        echo "ERROR: KiSing does not exist." >&2
        echo "ERROR: Please download it from http://shijt.site/index.php/2021/05/16/kising-the-first-open-source-mandarin-singing-voice-synthesis-corpus" >&2
        echo "ERROR: and locate it at ${db_root}/KiSing" >&2
        exit 1
    fi
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" \
        --wav-glob 'KiSing/**/*.wav' --num-dev 3 --num-eval 3
}

source ../../common/run_stages.sh "$@"
