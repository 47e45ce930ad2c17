#!/usr/bin/env bash
# JSUT (Japanese, single speaker) recipe; stages shared with egs/common/run_stages.sh.
cd "$(dirname "$0")"
conf=conf/parallel_wavegan.v1.yaml

download() {
    if [ ! -d "${db_root}/jsut_ver1.1" ]; then
        mkdir -p "${db_root}"
        (cd "${db_root}" && wget -q http://ss-takashi.sakura.ne.jp/corpus/jsut_ver1.1.zip \
         && unzip -q jsut_ver1.1.zip)
    fi
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" --wav-glob 'jsut_ver1.1/basic5000/wav/*.wav'
}

source ../../common/run_stages.sh "$@"
