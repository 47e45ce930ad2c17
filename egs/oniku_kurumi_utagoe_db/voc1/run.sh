#!/usr/bin/env bash
# oniku_kurumi_utagoe_db singing-voice vocoder recipe (24 kHz); stages shared with
# egs/common/run_stages.sh (reference egs/oniku_kurumi_utagoe_db/voc1/run.sh).
cd "$(dirname "$0")"
conf=conf/hifigan.v1.yaml

download() {
    if [ ! -e "${db_root}/ONIKU_KURUMI_UTAGOE_DB" ]; then
        echo "ERROR: ONIKU_KURUMI_UTAGOE_DB does not exist." >&2
        echo "ERROR: Please download it from http://onikuru.info/db-download/" >&2
        echo "ERROR: and locate it at ${db_root}/ONIKU_KURUMI_UTAGOE_DB" >&2
        exit 1
    fi
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" \
        --wav-glob 'ONIKU_KURUMI_UTAGOE_DB/**/*.wav' --num-dev 3 --num-eval 3
}

source ../../common/run_stages.sh "$@"
