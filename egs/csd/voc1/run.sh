#!/usr/bin/env bash
# CSD (children's song dataset, english+korean, 24 kHz) vocoder recipe;
# stages shared with egs/common/run_stages.sh (reference egs/csd/voc1/run.sh).
cd "$(dirname "$0")"
conf=conf/hifigan.v1.yaml

download() {
    if [ ! -d "${db_root}/CSD" ]; then
        mkdir -p "${db_root}"
        (cd "${db_root}" && wget -q -O CSD.zip "https://zenodo.org/record/4785016/files/CSD.zip?download=1" \
         && unzip -q CSD.zip)
    fi
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" \
        --wav-glob 'CSD/*/wav/*.wav' --num-dev 4 --num-eval 4
}

source ../../common/run_stages.sh "$@"
