#!/usr/bin/env bash
# Synthetic-corpus debug recipe: the offline stand-in for the reference's
# yesno integration recipe (egs/yesno/voc1/run.sh). Generates a tiny sine
# corpus locally; all stages shared with egs/common/run_stages.sh
# (stage 0 data gen, 1 features+stats+norm, 2 train, 3 decode, 4 eval).
cd "$(dirname "$0")"
conf=conf/parallel_wavegan.v1.debug.yaml
stage=0
n_utts=12
rich=false

# peel off --n_utts before the shared parser sees it
args=()
while [ $# -gt 0 ]; do
    case "$1" in
        --n_utts) n_utts="$2"; shift 2 ;;
        --rich) rich="$2"; shift 2 ;;
        *) args+=("$1"); shift ;;
    esac
done
set -- ${args[@]+"${args[@]}"}

download() { :; }  # nothing to download: the corpus is generated in stage 0

data_prep() {
    rich_flag=()
    [ "${rich}" = true ] && rich_flag=(--rich)
    python local/make_synthetic_data.py --outdir data --n-utts "${n_utts}" \
        --config "${conf}" ${rich_flag[@]+"${rich_flag[@]}"}
}

source ../../common/run_stages.sh "$@"
