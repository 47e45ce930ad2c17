#!/usr/bin/env bash
# CMU Arctic (16 kHz, per-speaker) recipe; stages shared with egs/common/run_stages.sh.
cd "$(dirname "$0")"
conf=conf/parallel_wavegan.v1.yaml

download() {
    for spk in ${spks:-slt}; do
        if [ ! -d "${db_root}/cmu_us_${spk}_arctic" ]; then
            mkdir -p "${db_root}"
            (cd "${db_root}" && wget -q "http://festvox.org/cmu_arctic/cmu_arctic/packed/cmu_us_${spk}_arctic-0.95-release.tar.bz2" \
             && tar xjf "cmu_us_${spk}_arctic-0.95-release.tar.bz2")
        fi
    done
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" --wav-glob 'cmu_us_*_arctic/wav/*.wav' --num-dev 66 --num-eval 66
}

spks=${spks:-slt}
source ../../common/run_stages.sh "$@"
