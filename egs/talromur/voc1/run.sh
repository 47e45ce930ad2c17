#!/usr/bin/env bash
# Talromur (Icelandic, 22.05 kHz, per-speaker) vocoder recipe; stages shared
# with egs/common/run_stages.sh (reference egs/talromur/voc1/run.sh).
# Select the speaker with --spks (alfur bjartur bui dilja rosa salka ugla).
cd "$(dirname "$0")"
conf=conf/parallel_wavegan.v1.yaml
spks=${spks:-alfur}

download() {
    for spk in ${spks}; do
        if [ ! -d "${db_root}/${spk}" ]; then
            mkdir -p "${db_root}"
            (cd "${db_root}" && wget -q "https://repository.clarin.is/repository/xmlui/bitstream/handle/20.500.12537/104/${spk}.zip" \
             && unzip -q "${spk}.zip")
        fi
    done
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" \
        --wav-glob '*/audio/*.wav' --spk-regex '([^/]+)/audio/' \
        --spks "${spks}" --num-dev 100 --num-eval 100
}

source ../../common/run_stages.sh "$@"
