#!/usr/bin/env bash
# VCTK VQ-VAE (wav2wav) recipe with global speaker conditioning; stages
# shared with egs/common/run_stages.sh (reference egs/vctk/vq1/run.sh).
cd "$(dirname "$0")"
conf=conf/conditioned_melgan_vae.v3.yaml
# local_mode/global_mode are auto-detected from the config's
# use_{local,global}_condition keys by run_stages.sh

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
}

source ../../common/run_stages.sh "$@"
