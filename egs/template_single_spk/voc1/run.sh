#!/usr/bin/env bash
# template: single-speaker corpus (point --db_root at a wav dir) recipe; stages shared with egs/common/run_stages.sh.
cd "$(dirname "$0")"
conf=conf/parallel_wavegan.v1.yaml

download() {
    echo "template recipe: place wavs under ${db_root} (no download stage)"
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" --wav-glob '**/*.wav' --num-dev 100 --num-eval 100
}

source ../../common/run_stages.sh "$@"
