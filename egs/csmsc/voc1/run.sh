#!/usr/bin/env bash
# CSMSC (Mandarin, single speaker) recipe; stages shared with egs/common/run_stages.sh.
cd "$(dirname "$0")"
conf=conf/parallel_wavegan.v1.yaml

download() {
    echo "CSMSC (BZNSYP) must be downloaded manually from https://www.data-baker.com/open_source.html into ${db_root}/CSMSC"
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" --wav-glob 'CSMSC/Wave/*.wav'
}

source ../../common/run_stages.sh "$@"
