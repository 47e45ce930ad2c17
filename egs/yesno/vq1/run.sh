#!/usr/bin/env bash
# yesno VQ-VAE (wav2wav) debug recipe; stages shared with
# egs/common/run_stages.sh (reference egs/yesno/vq1/run.sh).
# local_mode/global_mode are auto-detected from the config's
# use_{local,global}_condition keys by run_stages.sh.
cd "$(dirname "$0")"
conf=conf/conditioned_melgan_vae.v3.debug.yaml

download() {
    if [ ! -d "${db_root}/waves_yesno" ]; then
        mkdir -p "${db_root}"
        (cd "${db_root}" && wget -q http://www.openslr.org/resources/1/waves_yesno.tar.gz \
         && tar xzf waves_yesno.tar.gz)
    fi
}

data_prep() {
    # single 'speaker': every utterance maps to spk yes (2 global embeddings)
    python ../../common/data_prep.py --db-root "${db_root}" \
        --wav-glob 'waves_yesno/*.wav' --spk-regex '(waves)_yesno/' \
        --num-dev 10 --num-eval 10
}

source ../../common/run_stages.sh "$@"
