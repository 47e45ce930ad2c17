#!/usr/bin/env bash
# natsume singing-voice vocoder recipe (24 kHz); stages shared with
# egs/common/run_stages.sh (reference egs/natsume/voc1/run.sh).
cd "$(dirname "$0")"
conf=conf/hifigan.v1.yaml

download() {
    if [ ! -e "${db_root}/Natsume_Singing_DB" ]; then
        echo "ERROR: Natsume_Singing_DB does not exist." >&2
        echo "ERROR: Please download it from https://bowlroll.net/file/224647" >&2
        echo "ERROR: and locate it at ${db_root}/Natsume_Singing_DB" >&2
        exit 1
    fi
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" \
        --wav-glob 'Natsume_Singing_DB/**/*.wav' --num-dev 3 --num-eval 3
}

source ../../common/run_stages.sh "$@"
