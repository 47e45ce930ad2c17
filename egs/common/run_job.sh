#!/usr/bin/env bash
# Job submission wrapper — the analogue of Kaldi's run.pl/slurm.pl/ssh.pl
# backend selection (reference egs/ljspeech/voc1/cmd.sh:31-40 chooses among
# utils/run.pl, slurm.pl, queue.pl, ssh.pl). One backend-neutral interface:
#
#   run_job.sh [--num-threads N] [--gpu N] <logfile> <command...>
#
# Backend comes from $cmd_backend (default "local"):
#   local — run the command in this shell, output to <logfile>
#   slurm — srun (blocking) with -c/--gres mapped from the options
#   queue — SGE qsub -sync y (blocking), -pe smp/-l gpu mapped from the
#           options, log via -o (the queue.pl analogue,
#           reference egs/ljspeech/voc1/cmd.sh:31-35)
#   ssh   — round-robin over the hosts in $ssh_hosts (space-separated);
#           the working directory is replicated via cd
#
# Recipes set e.g. `cmd_backend=slurm train_cmd="bash egs/common/run_job.sh"`
# in cmd.sh, matching the reference's $train_cmd usage.

set -euo pipefail

num_threads=1
gpus=0
while [ $# -gt 0 ]; do
    case "$1" in
        --num-threads) num_threads="$2"; shift 2 ;;
        --gpu) gpus="$2"; shift 2 ;;
        --*) echo "run_job.sh: unknown option $1" >&2; exit 1 ;;
        *) break ;;
    esac
done
[ $# -ge 2 ] || { echo "usage: run_job.sh [opts] <logfile> <cmd...>" >&2; exit 1; }
log=$1; shift
mkdir -p "$(dirname "${log}")"

backend=${cmd_backend:-local}
case "${backend}" in
    local)
        "$@" > "${log}" 2>&1
        ;;
    slurm)
        srun_opts=(--ntasks=1 --cpus-per-task="${num_threads}")
        [ "${gpus}" -gt 0 ] && srun_opts+=("--gres=gpu:${gpus}")
        srun "${srun_opts[@]}" "$@" > "${log}" 2>&1
        ;;
    queue)
        qsub_opts=(-sync y -cwd -j y -o "${log}" -b y)
        [ "${num_threads}" -gt 1 ] && qsub_opts+=(-pe smp "${num_threads}")
        [ "${gpus}" -gt 0 ] && qsub_opts+=(-l "gpu=${gpus}")
        qsub "${qsub_opts[@]}" "$@"
        ;;
    ssh)
        [ -n "${ssh_hosts:-}" ] || { echo "ssh backend needs \$ssh_hosts" >&2; exit 1; }
        # round-robin host selection keyed on the log name for determinism
        read -r -a hosts <<< "${ssh_hosts}"
        idx=$(( $(echo "${log}" | cksum | cut -d' ' -f1) % ${#hosts[@]} ))
        host=${hosts[${idx}]}
        printf -v cmd_q '%q ' "$@"
        ssh "${host}" "cd $(printf '%q' "${PWD}") && ${cmd_q}" > "${log}" 2>&1
        ;;
    *)
        echo "run_job.sh: unknown \$cmd_backend '${backend}'" >&2; exit 1
        ;;
esac
