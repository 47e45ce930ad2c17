# Job submission backend selection — analogue of the reference's cmd.sh
# (reference egs/ljspeech/voc1/cmd.sh:31-40 picks run.pl / slurm.pl /
# queue.pl / ssh.pl). Here one wrapper (egs/common/run_job.sh) serves all
# backends; pick one by exporting cmd_backend before (or while) sourcing.
#
#   local : run jobs on this host (default)
#   slurm : submit through srun (blocking); --gpu/--num-threads map to
#           --gres/--cpus-per-task
#   queue : SGE qsub -sync y (blocking); --gpu/--num-threads map to
#           -l gpu= / -pe smp (the queue.pl analogue)
#   ssh   : round-robin over $ssh_hosts (e.g. "host1 host2")
#
# Usage from a recipe:   . ./cmd.sh; ./run.sh --cmd "${train_cmd}"
# or simply:             ./run.sh --cmd_backend slurm

export cmd_backend=${cmd_backend:-local}
export train_cmd="bash $(cd "$(dirname "${BASH_SOURCE[0]}")/../../common" && pwd)/run_job.sh"
export cuda_cmd="${train_cmd} --gpu 1"
export decode_cmd="${train_cmd}"
