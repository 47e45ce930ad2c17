#!/usr/bin/env bash
# ofuton_p_utagoe_db singing-voice vocoder recipe (24 kHz); stages shared with
# egs/common/run_stages.sh (reference egs/ofuton_p_utagoe_db/voc1/run.sh).
cd "$(dirname "$0")"
conf=conf/hifigan.v1.yaml

download() {
    if [ ! -e "${db_root}/OFUTON_P_UTAGOE_DB" ]; then
        echo "ERROR: OFUTON_P_UTAGOE_DB does not exist." >&2
        echo "ERROR: Please download it from https://sites.google.com/view/oftn-utagoedb (authentication required)" >&2
        echo "ERROR: and locate it at ${db_root}/OFUTON_P_UTAGOE_DB" >&2
        exit 1
    fi
}

data_prep() {
    python ../../common/data_prep.py --db-root "${db_root}" \
        --wav-glob 'OFUTON_P_UTAGOE_DB/**/*.wav' --num-dev 3 --num-eval 3
}

source ../../common/run_stages.sh "$@"
