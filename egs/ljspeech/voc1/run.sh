#!/usr/bin/env bash
# LJSpeech vocoder recipe (the flagship corpus); stages shared with
# egs/common/run_stages.sh — sharded --n_jobs feature extraction, training,
# decoding, and the stage-4 objective evaluation loop are identical to every
# other recipe (reference egs/ljspeech/voc1/run.sh stages -1..3 + eval).
cd "$(dirname "$0")"
conf=conf/parallel_wavegan.v1.yaml

download() {
    if [ ! -d "${db_root}/LJSpeech-1.1" ]; then
        mkdir -p "${db_root}"
        (cd "${db_root}" \
         && wget -q https://data.keithito.com/data/speech/LJSpeech-1.1.tar.bz2 \
         && tar xjf LJSpeech-1.1.tar.bz2)
    fi
}

data_prep() {
    # reference split: last 500 utterances to dev/eval (250 each)
    python ../../common/data_prep.py --db-root "${db_root}" \
        --wav-glob 'LJSpeech-1.1/wavs/*.wav' --num-dev 250 --num-eval 250
}

source ../../common/run_stages.sh "$@"
