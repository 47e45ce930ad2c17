#!/usr/bin/env bash
# template: multi-speaker corpus (wavs under <db_root>/<spk>/*.wav) recipe; stages shared with egs/common/run_stages.sh.
cd "$(dirname "$0")"
conf=conf/parallel_wavegan.v1.yaml

download() {
    echo "template recipe: place wavs under ${db_root}/<spk>/ (no download stage)"
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" --wav-glob '*/*.wav' --spk-regex '/([^/]+)/[^/]+[.]wav$' --num-dev 100 --num-eval 100
}

source ../../common/run_stages.sh "$@"
