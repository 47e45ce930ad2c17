#!/usr/bin/env bash
# Synthetic-corpus debug recipe: the offline stand-in for the reference's
# yesno integration recipe (egs/yesno/voc1/run.sh). Generates a tiny sine
# corpus locally, then runs the full staged pipeline:
#   stage 0: data generation
#   stage 1: feature extraction + statistics + normalization
#   stage 2: training
#   stage 3: decoding
#   stage 4: objective evaluation (MCD / log-F0)
set -euo pipefail

source "$(dirname "$0")/../../common/path.sh"

stage=0
stop_stage=4
conf=conf/parallel_wavegan.v1.debug.yaml
tag=""
n_utts=12
resume=""

# simple flag parsing (--name value)
while [ $# -gt 0 ]; do
    case "$1" in
        --stage) stage="$2"; shift 2 ;;
        --stop_stage|--stop-stage) stop_stage="$2"; shift 2 ;;
        --conf) conf="$2"; shift 2 ;;
        --tag) tag="$2"; shift 2 ;;
        --n_utts) n_utts="$2"; shift 2 ;;
        --resume) resume="$2"; shift 2 ;;
        *) echo "unknown option: $1" >&2; exit 1 ;;
    esac
done

[ -z "${tag}" ] && tag=$(basename "${conf}" .yaml)
expdir="exp/${tag}"
dumpdir="dump"

train() { python -m parallelwavegan_tpu.bin.train "$@"; }
decode() { python -m parallelwavegan_tpu.bin.decode "$@"; }

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "Stage 0: Generate synthetic corpus"
    python local/make_synthetic_data.py --outdir data --n-utts "${n_utts}" \
        --config "${conf}"
fi

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
    echo "Stage 1: Feature extraction / statistics / normalization"
    for set in train dev eval; do
        python -m parallelwavegan_tpu.bin.preprocess \
            --rootdir "data/${set}" --dumpdir "${dumpdir}/${set}/raw" \
            --config "${conf}"
    done
    python -m parallelwavegan_tpu.bin.compute_statistics \
        --rootdir "${dumpdir}/train/raw" --dumpdir "${dumpdir}/train" \
        --config "${conf}"
    for set in train dev eval; do
        python -m parallelwavegan_tpu.bin.normalize \
            --rootdir "${dumpdir}/${set}/raw" \
            --dumpdir "${dumpdir}/${set}/norm" \
            --stats "${dumpdir}/train/stats.h5" --config "${conf}"
    done
fi

if [ "${stage}" -le 2 ] && [ "${stop_stage}" -ge 2 ]; then
    echo "Stage 2: Training"
    mkdir -p "${expdir}"
    train --train-dumpdir "${dumpdir}/train/norm" \
        --dev-dumpdir "${dumpdir}/dev/norm" \
        --outdir "${expdir}" --config "${conf}" \
        ${resume:+--resume "${resume}"}
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
    echo "Stage 3: Decoding"
    ckpt=$(ls -t "${expdir}"/checkpoint-*.ckpt | head -n 1)
    decode --dumpdir "${dumpdir}/eval/norm" \
        --outdir "${expdir}/wav" --checkpoint "${ckpt}"
fi

if [ "${stage}" -le 4 ] && [ "${stop_stage}" -ge 4 ]; then
    echo "Stage 4: Objective evaluation"
    python -m parallelwavegan_tpu.bin.evaluate_mcd \
        --outdir "${expdir}/wav" --gt-wavdir data/eval --n-jobs 2
    python -m parallelwavegan_tpu.bin.evaluate_f0 \
        --outdir "${expdir}/wav" --gt-wavdir data/eval --n-jobs 2
fi

echo "Finished."
