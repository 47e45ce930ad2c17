#!/usr/bin/env bash
# LJSpeech vocoder recipe (structure mirrors the reference
# egs/ljspeech/voc1/run.sh stages; download stage expects network or a
# pre-downloaded corpus at ${db_root}).
#   stage -1: download            stage 0: data preparation
#   stage  1: features+stats+norm stage 2: training
#   stage  3: decoding            stage 4: objective evaluation
set -euo pipefail

stage=-1
stop_stage=4
conf=conf/parallel_wavegan.v1.yaml
tag=""
db_root=downloads
resume=""
pretrain=""

while [ $# -gt 0 ]; do
    case "$1" in
        --stage) stage="$2"; shift 2 ;;
        --stop_stage|--stop-stage) stop_stage="$2"; shift 2 ;;
        --conf) conf="$2"; shift 2 ;;
        --tag) tag="$2"; shift 2 ;;
        --db_root) db_root="$2"; shift 2 ;;
        --resume) resume="$2"; shift 2 ;;
        --pretrain) pretrain="$2"; shift 2 ;;
        *) echo "unknown option: $1" >&2; exit 1 ;;
    esac
done

[ -z "${tag}" ] && tag=$(basename "${conf}" .yaml)
expdir="exp/${tag}"
dumpdir="dump"

if [ "${stage}" -le -1 ] && [ "${stop_stage}" -ge -1 ]; then
    echo "Stage -1: Download LJSpeech"
    if [ ! -d "${db_root}/LJSpeech-1.1" ]; then
        mkdir -p "${db_root}"
        (cd "${db_root}" \
         && wget -q https://data.keithito.com/data/speech/LJSpeech-1.1.tar.bz2 \
         && tar xjf LJSpeech-1.1.tar.bz2)
    fi
fi

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "Stage 0: Data preparation (train/dev/eval split)"
    python local/data_prep.py --db-root "${db_root}/LJSpeech-1.1" \
        --outdir data
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
    python -m parallelwavegan_tpu.bin.train \
        --train-dumpdir "${dumpdir}/train/norm" \
        --dev-dumpdir "${dumpdir}/dev/norm" \
        --outdir "${expdir}" --config "${conf}" \
        ${resume:+--resume "${resume}"} \
        ${pretrain:+--pretrain "${pretrain}"}
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
    echo "Stage 3: Decoding"
    ckpt=$(ls -t "${expdir}"/checkpoint-*.ckpt | head -n 1)
    python -m parallelwavegan_tpu.bin.decode \
        --dumpdir "${dumpdir}/eval/norm" \
        --outdir "${expdir}/wav" --checkpoint "${ckpt}"
fi

if [ "${stage}" -le 4 ] && [ "${stop_stage}" -ge 4 ]; then
    echo "Stage 4: Objective evaluation"
    python -m parallelwavegan_tpu.bin.evaluate_mcd \
        --outdir "${expdir}/wav" --gt-wavdir data/eval
    python -m parallelwavegan_tpu.bin.evaluate_f0 \
        --outdir "${expdir}/wav" --gt-wavdir data/eval
fi

echo "Finished."
