#!/usr/bin/env bash
# CVSS-C discrete-unit (speech-to-speech) vocoder recipe; stages shared with
# egs/common/run_stages.sh (reference egs/cvss_c/hubert_voc1/run.sh shape).
#
# CVSS-C must be obtained from https://github.com/google-research-datasets/cvss
# (requires Common Voice audio); place per-split wavs under
# ${db_root}/cvss_c/<set>/ and the HuBERT-token `text` files in data/<set>/.
cd "$(dirname "$0")"
conf=conf/hifigan_hubert_duration.v1.yaml
token_mode=true

download() {
    echo "CVSS-C must be downloaded manually (see header comment)."
}

data_prep() {
    for set in train dev eval; do
        python ../../common/data_prep.py --db-root "${db_root}" \
            --wav-glob "cvss_c/${set}/*.wav" --num-dev 1 --num-eval 1 \
            --outdir "data_tmp_${set}" || true
    done
    # cvss_c ships pre-split sets: take each split's full list
    for set in train dev eval; do
        mkdir -p "data/${set}"
        cat "data_tmp_${set}"/*/wav.scp | sort -u > "data/${set}/wav.scp"
        rm -rf "data_tmp_${set}"
        if [ ! -f "data/${set}/text" ]; then
            echo "WARNING: data/${set}/text missing; provide HuBERT token" \
                 "sequences before stage 1." >&2
        fi
    done
}

source ../../common/run_stages.sh "$@"
