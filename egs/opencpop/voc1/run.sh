#!/usr/bin/env bash
# Opencpop (Mandarin singing, 24 kHz) vocoder recipe; stages shared with
# egs/common/run_stages.sh (reference egs/opencpop/voc1/run.sh).
# Use --conf conf/uhifigan.v1.yaml for the sine-excitation U-Net variant.
cd "$(dirname "$0")"
conf=conf/hifigan.v1.yaml

download() {
    if [ ! -e "${db_root}/Opencpop" ]; then
        echo "ERROR: Opencpop data does not exist." >&2
        echo "ERROR: Please download it from https://wenet.org.cn/opencpop/download/" >&2
        echo "ERROR: and locate it at ${db_root}/Opencpop" >&2
        exit 1
    fi
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" \
        --wav-glob 'Opencpop/segments/wavs/*.wav' --num-dev 100 --num-eval 100
}

source ../../common/run_stages.sh "$@"
