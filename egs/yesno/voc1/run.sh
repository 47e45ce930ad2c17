#!/usr/bin/env bash
# yesno (tiny 8 kHz debug corpus, CI integration) recipe; stages shared with egs/common/run_stages.sh.
cd "$(dirname "$0")"
conf=conf/parallel_wavegan.v1.debug.yaml

download() {
    if [ ! -d "${db_root}/waves_yesno" ]; then
        mkdir -p "${db_root}"
        (cd "${db_root}" && wget -q http://www.openslr.org/resources/1/waves_yesno.tar.gz \
         && tar xzf waves_yesno.tar.gz)
    fi
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" --wav-glob 'waves_yesno/*.wav' --num-dev 10 --num-eval 10
}

source ../../common/run_stages.sh "$@"
