#!/usr/bin/env bash
# Google Speech Commands v0.02 (16 kHz, 1-second keywords) vocoder recipe;
# stages shared with egs/common/run_stages.sh (reference
# egs/speech_commands/voc1/run.sh).
cd "$(dirname "$0")"
conf=conf/parallel_wavegan.v1.yaml

download() {
    if [ ! -d "${db_root}/speech_commands_v0.02" ]; then
        mkdir -p "${db_root}/speech_commands_v0.02"
        (cd "${db_root}/speech_commands_v0.02" \
         && wget -q http://download.tensorflow.org/data/speech_commands_v0.02.tar.gz \
         && tar xzf speech_commands_v0.02.tar.gz && rm -f speech_commands_v0.02.tar.gz)
    fi
}

data_prep() {
    # keyword directories act as "speakers" so every split covers all words;
    # _background_noise_ is excluded by the glob (word dirs are lowercase a-z)
    python ../../common/data_prep.py --db-root "${db_root}" \
        --wav-glob 'speech_commands_v0.02/[a-z]*/*.wav' \
        --spk-regex 'speech_commands_v0.02/([^/]+)/' --num-dev 350 --num-eval 350
}

source ../../common/run_stages.sh "$@"
