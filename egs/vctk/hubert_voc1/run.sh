#!/usr/bin/env bash
# VCTK discrete-symbol (HuBERT-token) vocoder recipe; stages shared with
# egs/common/run_stages.sh (reference egs/vctk/hubert_voc1/run.sh shape).
#
# Token sequences are NOT extracted here (HuBERT + k-means is an external
# step, as in the reference): before stage 1, place a Kaldi-style `text`
# file (<utt_id> <tok> <tok> ...) in data/{train,dev,eval}/.
cd "$(dirname "$0")"
conf=conf/hifigan_hubert_duration.v1.yaml
token_mode=true

download() {
    if [ ! -d "${db_root}/VCTK-Corpus" ]; then
        mkdir -p "${db_root}"
        (cd "${db_root}" && wget -q http://www.udialogue.org/download/VCTK-Corpus.tar.gz \
         && tar xzf VCTK-Corpus.tar.gz)
    fi
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" \
        --wav-glob 'VCTK-Corpus/wav48/*/*.wav' \
        --spk-regex '/(p[0-9]+)/' --num-dev 220 --num-eval 220
    for set in train dev eval; do
        if [ ! -f "data/${set}/text" ]; then
            echo "WARNING: data/${set}/text (discrete token sequences) is" \
                 "missing; provide it before stage 1." >&2
        fi
    done
}

source ../../common/run_stages.sh "$@"
