"""egs/common/run_job.sh backend smoke tests against stub srun/qsub/ssh
executables on PATH (the run.pl/slurm.pl/queue.pl/ssh.pl behavior contract,
reference egs/ljspeech/voc1/cmd.sh:31-40)."""

import os
import stat
import subprocess

import pytest

RUN_JOB = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "egs", "common", "run_job.sh",
)


def _write_stub(bindir, name, body):
    path = os.path.join(bindir, name)
    with open(path, "w") as f:
        f.write("#!/usr/bin/env bash\n" + body)
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)
    return path


def _run(args, env_extra, cwd):
    env = dict(os.environ, **env_extra)
    return subprocess.run(
        ["bash", RUN_JOB, *args], env=env, cwd=cwd,
        capture_output=True, text=True,
    )


def test_local_backend_runs_and_logs(tmp_path):
    log = tmp_path / "logs" / "job.log"
    r = _run([str(log), "echo", "hello world"], {"cmd_backend": "local"},
             str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert log.read_text().strip() == "hello world"


def test_slurm_backend_option_mapping(tmp_path):
    """The srun arm must map --num-threads/--gpu to -c/--gres and still
    execute the payload (stub srun strips options and execs the rest)."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    _write_stub(
        bindir, "srun",
        'echo "$@" > "$SRUN_ARGS"\n'
        'while [[ "$1" == --* ]]; do shift; done\n'
        'exec "$@"\n',
    )
    log = tmp_path / "job.log"
    args_file = tmp_path / "srun_args"
    r = _run(
        ["--num-threads", "4", "--gpu", "2", str(log), "echo", "ran"],
        {
            "cmd_backend": "slurm",
            "PATH": f"{bindir}:{os.environ['PATH']}",
            "SRUN_ARGS": str(args_file),
        },
        str(tmp_path),
    )
    assert r.returncode == 0, r.stderr
    assert log.read_text().strip() == "ran"
    recorded = args_file.read_text()
    assert "--ntasks=1" in recorded
    assert "--cpus-per-task=4" in recorded
    assert "--gres=gpu:2" in recorded


def test_queue_backend_qsub_mapping(tmp_path):
    """SGE arm: blocking qsub -sync y with -pe smp/-l gpu mapping and the
    log routed through -o (queue.pl analogue)."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    # stub qsub: record args, honor -o <log>, run the payload (the first
    # non-option token starts the command; qsub options are order-agnostic)
    _write_stub(
        bindir, "qsub",
        'echo "$@" > "$QSUB_ARGS"\n'
        'out=/dev/stdout\n'
        'while [ $# -gt 0 ]; do\n'
        '  case "$1" in\n'
        '    -o) out="$2"; shift 2 ;;\n'
        '    -pe) shift 3 ;;\n'
        '    -sync|-l|-b|-j) shift 2 ;;\n'
        '    -cwd) shift ;;\n'
        '    *) break ;;\n'
        '  esac\n'
        'done\n'
        '"$@" > "$out" 2>&1\n',
    )
    log = tmp_path / "q.log"
    args_file = tmp_path / "qsub_args"
    r = _run(
        ["--num-threads", "8", "--gpu", "1", str(log), "echo", "queued"],
        {
            "cmd_backend": "queue",
            "PATH": f"{bindir}:{os.environ['PATH']}",
            "QSUB_ARGS": str(args_file),
        },
        str(tmp_path),
    )
    assert r.returncode == 0, r.stderr
    assert log.read_text().strip() == "queued"
    recorded = args_file.read_text()
    assert "-sync y" in recorded
    assert "-pe smp 8" in recorded
    assert "-l gpu=1" in recorded


def test_ssh_backend_round_robin_and_quoting(tmp_path):
    """ssh arm: host chosen round-robin from $ssh_hosts, working dir
    replicated, and arguments with spaces/specials quoted exactly."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    # stub ssh: record host, run the remote command string locally
    _write_stub(
        bindir, "ssh",
        'echo "$1" > "$SSH_HOST"\n'
        'bash -c "$2"\n',
    )
    log = tmp_path / "s.log"
    host_file = tmp_path / "ssh_host"
    payload = "a b'c$d"  # quoting stress
    r = _run(
        [str(log), "printf", "%s", payload],
        {
            "cmd_backend": "ssh",
            "ssh_hosts": "hostA hostB hostC",
            "PATH": f"{bindir}:{os.environ['PATH']}",
            "SSH_HOST": str(host_file),
        },
        str(tmp_path),
    )
    assert r.returncode == 0, r.stderr
    assert log.read_text() == payload
    assert host_file.read_text().strip() in {"hostA", "hostB", "hostC"}
    # determinism: same log name -> same host
    r2 = _run(
        [str(log), "true"],
        {
            "cmd_backend": "ssh",
            "ssh_hosts": "hostA hostB hostC",
            "PATH": f"{bindir}:{os.environ['PATH']}",
            "SSH_HOST": str(tmp_path / "ssh_host2"),
        },
        str(tmp_path),
    )
    assert r2.returncode == 0
    assert (tmp_path / "ssh_host2").read_text() == host_file.read_text()


def test_unknown_backend_fails_fast(tmp_path):
    r = _run([str(tmp_path / "x.log"), "true"],
             {"cmd_backend": "pbs"}, str(tmp_path))
    assert r.returncode != 0
    assert "unknown" in r.stderr
