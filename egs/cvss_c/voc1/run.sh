#!/usr/bin/env bash
# CVSS-C mel vocoder recipe (16 kHz); stages shared with
# egs/common/run_stages.sh (reference egs/cvss_c/voc1/run.sh).
# CVSS-C must be obtained from https://github.com/google-research-datasets/cvss
# (requires Common Voice audio); place per-split wavs under
# ${db_root}/cvss_c/<set>/.
cd "$(dirname "$0")"
conf=conf/hifigan.v1.yaml

download() {
    echo "CVSS-C must be downloaded manually (see header comment)."
}

data_prep() {
    for set in train dev eval; do
        mkdir -p "data/${set}"
        ls "${db_root}/cvss_c/${set}"/*.wav 2>/dev/null | while read -r w; do
            echo "$(basename "${w}" .wav) ${w}"
        done | sort -u > "data/${set}/wav.scp"
        [ -s "data/${set}/wav.scp" ] || \
            echo "WARNING: data/${set}/wav.scp is empty." >&2
    done
}

source ../../common/run_stages.sh "$@"
