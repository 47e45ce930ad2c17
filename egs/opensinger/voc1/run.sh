#!/usr/bin/env bash
# OpenSinger (multi-singer Mandarin, 24 kHz) vocoder recipe; stages shared
# with egs/common/run_stages.sh (reference egs/opensinger/voc1/run.sh).
# Use --conf conf/uhifigan.v1.yaml for the sine-excitation U-Net variant.
cd "$(dirname "$0")"
conf=conf/hifigan.v1.yaml

download() {
    if [ ! -e "${db_root}/OpenSinger" ]; then
        echo "ERROR: OpenSinger data does not exist." >&2
        echo "ERROR: Please download it from https://github.com/Multi-Singer/Multi-Singer.github.io" >&2
        echo "ERROR: and locate it at ${db_root}/OpenSinger" >&2
        exit 1
    fi
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" \
        --wav-glob 'OpenSinger/*Raw/*/*.wav' \
        --spk-regex 'Raw/([^/]+)/' --num-dev 200 --num-eval 200
}

source ../../common/run_stages.sh "$@"
