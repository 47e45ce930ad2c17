#!/usr/bin/env bash
# Opencpop discrete-token vocoder recipe (singing-voice HuBERT/k-means
# tokens -> waveform); stages shared with egs/common/run_stages.sh
# (reference egs/opencpop/token_voc1/run.sh shape).
#
# Token sequences are NOT extracted here (SSL model + k-means is an
# external step, as in the reference): before stage 1, place a Kaldi-style
# `text` file (<utt_id> <tok> <tok> ...) in data/{train,dev,eval}/.
# f0-conditioned configs (*_f0.v1.yaml) extract f0 at the token frame rate
# during stage 1 automatically (config key use_f0).
cd "$(dirname "$0")"
conf=conf/hifigan_token_16k_nodp_f0.v1.yaml
token_mode=true

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
    for set in train dev eval; do
        if [ ! -f "data/${set}/text" ]; then
            echo "WARNING: data/${set}/text (discrete token sequences) is" \
                 "missing; provide it before stage 1." >&2
        fi
    done
}

source ../../common/run_stages.sh "$@"
