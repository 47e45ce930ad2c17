#!/usr/bin/env bash
# Shared staged vocoder pipeline, sourced by every egs/<corpus>/<task>/run.sh
# (the analogue of the per-recipe run.sh bodies in the reference, factored
# out once instead of 27 near-identical copies).
#
#   stage -1: download            stage 0: data preparation
#   stage  1: features+stats+norm stage 2: training
#   stage  3: decoding            stage 4: objective evaluation
#
# The sourcing run.sh must define:
#   conf=...                 default config
#   download()  { ... }      stage -1 body
#   data_prep() { ... }      stage 0 body (writes data/{train,dev,eval}/wav.scp)
# and may set before sourcing:
#   use_f0=true              extract f0 at preprocessing (singing corpora)
#   token_mode=true          discrete-token recipe: data_prep must also write
#                            data/<set>/text (+ utt2spk/spk2idx); stage 1 uses
#                            preprocess_tokens and skips stats/normalization
#   skip_normalize=true      train/decode on raw (un-normalized) features
set -euo pipefail

source "$(dirname "${BASH_SOURCE[0]}")/path.sh"

stage=${stage:--1}
stop_stage=${stop_stage:-4}
tag=${tag:-}
db_root=${db_root:-downloads}
resume=${resume:-}
pretrain=${pretrain:-}
use_f0=${use_f0:-false}
token_mode=${token_mode:-false}
skip_normalize=${skip_normalize:-false}
n_jobs=${n_jobs:-4}
# job submission wrapper (Kaldi run.pl/slurm.pl analogue): every shard /
# training job runs as `$cmd <logfile> <command...>`; the backend is
# picked by $cmd_backend (local|slurm|ssh) inside run_job.sh, matching
# the reference's cmd.sh selection (egs/ljspeech/voc1/cmd.sh:31-40)
cmd=${cmd:-"bash $(dirname "${BASH_SOURCE[0]}")/run_job.sh"}

while [ $# -gt 0 ]; do
    case "$1" in
        --stage) stage="$2"; shift 2 ;;
        --stop_stage|--stop-stage) stop_stage="$2"; shift 2 ;;
        --conf) conf="$2"; shift 2 ;;
        --tag) tag="$2"; shift 2 ;;
        --db_root) db_root="$2"; shift 2 ;;
        --resume) resume="$2"; shift 2 ;;
        --pretrain) pretrain="$2"; shift 2 ;;
        --n_jobs) n_jobs="$2"; shift 2 ;;
        --cmd) cmd="$2"; shift 2 ;;
        --cmd_backend|--cmd-backend) export cmd_backend="$2"; shift 2 ;;
        *) echo "unknown option: $1" >&2; exit 1 ;;
    esac
done

[ -z "${tag}" ] && tag=$(basename "${conf}" .yaml)
expdir="exp/${tag}"
dumpdir="dump"

# auto-detect conditioning modes from the experiment config
if grep -qE "^use_local_condition: *[Tt]rue" "${conf}"; then
    local_mode=true
fi
if grep -qE "^use_global_condition: *[Tt]rue" "${conf}"; then
    global_mode=true
fi

if [ "${stage}" -le -1 ] && [ "${stop_stage}" -ge -1 ]; then
    echo "Stage -1: Download"
    download
fi

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "Stage 0: Data preparation"
    data_prep
fi

# round-robin split of data/<set>/wav.scp into n_jobs shards, then run the
# given preprocess module once per shard in parallel (the analogue of the
# reference's utils/make_subset_data.sh + run.pl JOB=1:n arrays,
# reference egs/ljspeech/voc1/run.sh:60-77); logs land next to the dumps
run_preprocess_jobs() { # set module extra-args...
    local set=$1 module=$2; shift 2
    local rawdir="${dumpdir}/${set}/raw"
    mkdir -p "${rawdir}"
    local n=${n_jobs}
    local n_utts
    n_utts=$(wc -l < "data/${set}/wav.scp")
    [ "${n}" -gt "${n_utts}" ] && n=${n_utts}
    if [ "${n}" -le 1 ]; then
        ${cmd} "${rawdir}/preprocessing.1.log" \
            python -m "parallelwavegan_tpu.bin.${module}" \
            --wav-scp "data/${set}/wav.scp" "$@" \
            --dumpdir "${rawdir}" --config "${conf}"
        tail -n 2 "${rawdir}/preprocessing.1.log" || true
        return
    fi
    for j in $(seq 1 "${n}"); do
        awk -v j="${j}" -v n="${n}" 'NR % n == j % n' \
            "data/${set}/wav.scp" > "${rawdir}/wav.${j}.scp"
    done
    local pids=()
    for j in $(seq 1 "${n}"); do
        ${cmd} "${rawdir}/preprocessing.${j}.log" \
            python -m "parallelwavegan_tpu.bin.${module}" \
            --wav-scp "${rawdir}/wav.${j}.scp" "$@" \
            --dumpdir "${rawdir}" --config "${conf}" &
        pids+=($!)
    done
    local fail=0
    for pid in "${pids[@]}"; do wait "${pid}" || fail=1; done
    if [ "${fail}" -ne 0 ]; then
        echo "ERROR: feature extraction failed; see ${rawdir}/preprocessing.*.log" >&2
        exit 1
    fi
}

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
    echo "Stage 1: Feature extraction / statistics / normalization"
    for set in train dev eval; do
        if [ "${token_mode}" = true ]; then
            spk_args=()
            if [ -f "data/${set}/utt2spk" ]; then
                spk_args=(--utt2spk "data/${set}/utt2spk"
                          --spk2idx "data/${set}/spk2idx")
            fi
            run_preprocess_jobs "${set}" preprocess_tokens \
                --text "data/${set}/text" "${spk_args[@]}"
        else
            extra_args=()
            [ "${use_f0}" = true ] && extra_args+=(--use-f0)
            # locally-conditioned recipes (vq1 local): dump log-f0+V/UV
            [ "${local_mode:-false}" = true ] && extra_args+=(--extract-f0)
            # multi-speaker prep wrote utt2spk/spk2idx: dump a 'global'
            # speaker-index key for globally-conditioned models (vq1)
            if [ "${global_mode:-false}" = true ] \
                   && [ -f "data/${set}/utt2spk" ]; then
                extra_args+=(--utt2spk "data/${set}/utt2spk"
                             --spk2idx "data/${set}/spk2idx")
            fi
            run_preprocess_jobs "${set}" preprocess "${extra_args[@]}"
        fi
    done
    if [ "${token_mode}" = true ] || [ "${skip_normalize}" = true ]; then
        for set in train dev eval; do
            rm -rf "${dumpdir}/${set}/norm"
            ln -sf "$(pwd)/${dumpdir}/${set}/raw" "${dumpdir}/${set}/norm"
        done
    else
        python -m parallelwavegan_tpu.bin.compute_statistics \
            --rootdir "${dumpdir}/train/raw" --dumpdir "${dumpdir}/train" \
            --config "${conf}"
        if [ "${local_mode:-false}" = true ]; then
            python -m parallelwavegan_tpu.bin.compute_statistics \
                --rootdir "${dumpdir}/train/raw" \
                --dumpdir "${dumpdir}/train" \
                --config "${conf}" --target-feats local
        fi
        for set in train dev eval; do
            python -m parallelwavegan_tpu.bin.normalize \
                --rootdir "${dumpdir}/${set}/raw" \
                --dumpdir "${dumpdir}/${set}/norm" \
                --stats "${dumpdir}/train/stats.h5" --config "${conf}"
            if [ "${local_mode:-false}" = true ]; then
                python -m parallelwavegan_tpu.bin.normalize \
                    --rootdir "${dumpdir}/${set}/raw" \
                    --dumpdir "${dumpdir}/${set}/norm" \
                    --stats "${dumpdir}/train/stats-local.h5" \
                    --config "${conf}" --target-feats local --skip-wav-copy
            fi
        done
    fi
fi

if [ "${stage}" -le 2 ] && [ "${stop_stage}" -ge 2 ]; then
    echo "Stage 2: Training"
    mkdir -p "${expdir}"
    ${cmd} --gpu 1 "${expdir}/train.log" \
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
    mkdir -p "${expdir}/gt_wav"
    # reconstruct ground-truth wavs from the dumped (unnormalized) audio so
    # the comparison matches the trimmed/gain-scaled training targets
    python - "$dumpdir/eval/raw" "${expdir}/gt_wav" "${conf}" <<'EOF'
import sys, glob, os, yaml
import numpy as np
from parallelwavegan_tpu.utils.io import read_hdf5, write_wav
raw, out, conf = sys.argv[1:4]
fs = yaml.safe_load(open(conf))["sampling_rate"]
for f in glob.glob(os.path.join(raw, "*.h5")):
    u = os.path.splitext(os.path.basename(f))[0]
    write_wav(os.path.join(out, u + ".wav"), read_hdf5(f, "wave"), fs)
for f in glob.glob(os.path.join(raw, "*-wave.npy")):
    u = os.path.basename(f)[: -len("-wave.npy")]
    write_wav(os.path.join(out, u + ".wav"), np.load(f), fs)
EOF
    python -m parallelwavegan_tpu.bin.evaluate_mcd \
        --outdir "${expdir}/wav" --gt-wavdir "${expdir}/gt_wav"
    python -m parallelwavegan_tpu.bin.evaluate_f0 \
        --outdir "${expdir}/wav" --gt-wavdir "${expdir}/gt_wav"
fi

echo "Finished."
