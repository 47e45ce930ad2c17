#!/usr/bin/env bash
# LibriTTS-R (sound-quality-restored LibriTTS, 24 kHz, multi-speaker) vocoder
# recipe; stages shared with egs/common/run_stages.sh (reference
# egs/libritts_r/voc1/run.sh).
cd "$(dirname "$0")"
conf=conf/hifigan.v1.yaml

download() {
    if [ ! -d "${db_root}/LibriTTS_R/train-clean-100" ]; then
        mkdir -p "${db_root}"
        (cd "${db_root}" && wget -q http://www.openslr.org/resources/141/train_clean_100.tar.gz \
         && tar xzf train_clean_100.tar.gz)
    fi
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" \
        --wav-glob 'LibriTTS_R/train-clean-100/*/*/*.wav' \
        --spk-regex 'train-clean-100/([0-9]+)/' --num-dev 500 --num-eval 500
}

source ../../common/run_stages.sh "$@"
