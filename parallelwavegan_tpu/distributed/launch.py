#!/usr/bin/env python3
"""Multi-process launcher (behavioral parity:
/root/reference/parallel_wavegan/distributed/launch.py:15-171).

On TPU pods each host runs one process over its local chips, so this
launcher spawns `--nproc_per_node` processes with the reference's
MASTER_ADDR/PORT + WORLD_SIZE/RANK rendezvous env vars, which
parallel/mesh.init_distributed translates into jax.distributed.initialize.
The `-c/--command` flag runs a console command instead of a python script
(used by recipes, reference egs/ljspeech/voc1/run.sh:122).

Note: on real TPU hardware one process per *host* is the norm (each process
owns all local chips); nproc_per_node>1 on a single host is mainly for
CPU-simulation of multi-host training.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys


def parse_args():
    parser = argparse.ArgumentParser(
        description="Distributed training launcher."
    )
    parser.add_argument("--nnodes", type=int, default=1)
    parser.add_argument("--node_rank", type=int, default=0)
    parser.add_argument("--nproc_per_node", type=int, default=1)
    parser.add_argument("--master_addr", default="127.0.0.1", type=str)
    parser.add_argument("--master_port", default=29500, type=int)
    parser.add_argument(
        "-c", "--command", action="store_true",
        help="run an arbitrary command instead of a python script",
    )
    parser.add_argument("training_script", type=str)
    parser.add_argument("training_script_args", nargs=argparse.REMAINDER)
    return parser.parse_args()


def main():
    args = parse_args()
    world_size = args.nnodes * args.nproc_per_node

    processes = []
    for local_rank in range(args.nproc_per_node):
        rank = args.node_rank * args.nproc_per_node + local_rank
        env = os.environ.copy()
        env["MASTER_ADDR"] = args.master_addr
        env["MASTER_PORT"] = str(args.master_port)
        env["WORLD_SIZE"] = str(world_size)
        env["RANK"] = str(rank)
        env["LOCAL_RANK"] = str(local_rank)
        if args.command:
            cmd = [args.training_script] + args.training_script_args
        else:
            cmd = [sys.executable, "-u", args.training_script]
            cmd += args.training_script_args
        processes.append(subprocess.Popen(cmd, env=env))

    try:
        for p in processes:
            p.wait()
            if p.returncode != 0:
                raise subprocess.CalledProcessError(p.returncode, p.args)
    except BaseException:
        for p in processes:
            if p.poll() is None:
                p.send_signal(signal.SIGTERM)
        raise


if __name__ == "__main__":
    main()
