#!/usr/bin/env bash
# VCTK multi-speaker vocoder recipe; stages shared with egs/common/run_stages.sh.
cd "$(dirname "$0")"
conf=conf/parallel_wavegan.v1.yaml

download() {
    if [ ! -d "${db_root}/VCTK-Corpus" ]; then
        mkdir -p "${db_root}"
        (cd "${db_root}" && wget -q http://www.udialogue.org/download/VCTK-Corpus.tar.gz \
         && tar xzf VCTK-Corpus.tar.gz)
    fi
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" --wav-glob 'VCTK-Corpus/wav48/*/*.wav' --spk-regex '/(p[0-9]+)/' --num-dev 220 --num-eval 220
}

source ../../common/run_stages.sh "$@"
