#!/usr/bin/env bash
# Stages 3-4 over EVERY checkpoint of an experiment: decode the eval set
# and run the objective metrics per checkpoint, then write a trajectory
# summary (exp/<tag>/trajectory.json). This is the quality-at-scale loop
# the reference leaves manual (run.sh stage 3 only decodes the latest
# checkpoint; evaluate_mcd is run by hand per README).
#
#   usage: local/eval_trajectory.sh [expdir] [eval_dumpdir]
set -euo pipefail
cd "$(dirname "$0")/.."
source ../../common/path.sh
exp=${1:-exp/rich_v1}
dump=${2:-dump/eval}
# prefix for per-checkpoint output dirs + the trajectory file: lets a
# re-evaluation on a grown eval set (e.g. the 16-utterance round-4 set)
# live beside the original 4-utterance evidence instead of clobbering it
prefix=${3:-wav_}
# only evaluate checkpoints >= this step count (0 = all)
min_steps=${4:-0}
# extra args for bin.decode; DECODE_ARGS="--device cpu" runs the decode
# sweep on the host so it can overlap with chip training
decode_args=(${DECODE_ARGS:-})

# ground-truth wavs from the dumped (trimmed/gain-scaled) audio
mkdir -p "${exp}/gt_wav"
python - "$dump/raw" "${exp}/gt_wav" "${exp}/config.yml" <<'EOF'
import sys, glob, os, yaml
from parallelwavegan_tpu.utils.io import read_hdf5, write_wav
raw, out, conf = sys.argv[1:4]
fs = yaml.safe_load(open(conf))["sampling_rate"]
for f in glob.glob(os.path.join(raw, "*.h5")):
    u = os.path.splitext(os.path.basename(f))[0]
    write_wav(os.path.join(out, u + ".wav"), read_hdf5(f, "wave"), fs)
EOF

for ckpt in $(ls "${exp}"/checkpoint-*steps.ckpt | sort -t- -k2 -n); do
    steps=$(basename "${ckpt}" | sed -e 's/checkpoint-//' -e 's/steps.ckpt//')
    [ "${steps}" -lt "${min_steps}" ] && continue
    outdir="${exp}/${prefix}${steps}"
    if [ ! -f "${outdir}/utt2mcd" ]; then
        echo "=== ${steps} steps: decode + eval ==="
        python -m parallelwavegan_tpu.bin.decode \
            --dumpdir "${dump}/norm" --outdir "${outdir}" \
            --checkpoint "${ckpt}" ${decode_args[@]+"${decode_args[@]}"}
        python -m parallelwavegan_tpu.bin.evaluate_mcd \
            --outdir "${outdir}" --gt-wavdir "${exp}/gt_wav"
        python -m parallelwavegan_tpu.bin.evaluate_f0 \
            --outdir "${outdir}" --gt-wavdir "${exp}/gt_wav"
    fi
done

python - "${exp}" "${prefix}" <<'EOF'
import glob, json, os, re, sys
import numpy as np
exp, prefix = sys.argv[1:3]
rows = []
for d in sorted(glob.glob(os.path.join(exp, prefix + "*")),
                key=lambda p: int(re.search(r"(\d+)$", p).group(1))):
    m = re.search(r"(\d+)$", d)
    if not d.startswith(os.path.join(exp, prefix)) or not m:
        continue
    steps = int(m.group(1))
    def col(fname, idx=1):
        path = os.path.join(d, fname)
        if not os.path.exists(path):
            return None
        vals = [float(line.split()[idx]) for line in open(path)
                if len(line.split()) > idx]
        return round(float(np.nanmean(vals)), 4)
    # utt2logf0rmse lines: <utt> <rmse> <vuv_error> <semitone_acc>
    rows.append({"steps": steps, "mcd": col("utt2mcd"),
                 "mcd_std": None, "log_f0_rmse": col("utt2logf0rmse", 1),
                 "vuv_error": col("utt2logf0rmse", 2),
                 "semitone_acc": col("utt2logf0rmse", 3)})
    mc = [float(l.split()[1]) for l in open(os.path.join(d, "utt2mcd"))]
    rows[-1]["mcd_std"] = round(float(np.std(mc)), 4)
out = os.path.join(
    exp, "trajectory.json" if prefix == "wav_"
    else f"trajectory.{prefix.rstrip('_')}.json"
)
json.dump(rows, open(out, "w"), indent=1)
print(json.dumps(rows))
print("wrote", out)
EOF
