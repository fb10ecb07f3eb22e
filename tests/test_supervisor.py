"""Training supervisor (scripts/train_supervisor.py): stall detection kills
the child, restarts resume from the newest checkpoint, --resume_latest
injects a resume on the first launch too. Uses a fake train script (no jax)
so the whole cycle runs in seconds."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Launch 1: writes a checkpoint, prints once, then goes silent (stall).
# Launch 2+: exits 0 immediately. Every launch appends its argv to
# launches.txt so the test can inspect what the supervisor injected.
_FAKE_TRAIN = r"""
import os, sys, time
args = sys.argv[1:]
logdir = args[args.index("--logdir") + 1]
os.makedirs(logdir, exist_ok=True)
marker = os.path.join(logdir, "launches.txt")
with open(marker, "a") as f:
    f.write(" ".join(args) + "\n")
n = len(open(marker).read().splitlines())
ckdir = os.path.join(logdir, "run", "checkpoints")
os.makedirs(ckdir, exist_ok=True)
with open(os.path.join(ckdir, f"{n * 1000}.ckpt"), "w") as f:
    f.write("x")
if n == 1:
    print("step 1", flush=True)
    time.sleep(600)  # no further log output -> supervisor must kill us
print("done", flush=True)
"""


def _run_supervisor(tmp_path, extra_args, fake_args):
    fake = tmp_path / "fake_train.py"
    fake.write_text(_FAKE_TRAIN)
    sup_log = tmp_path / "sup.log"
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "train_supervisor.py"),
        "--stall_secs", "3", "--max_restarts", "3",
        "--supervisor_log", str(sup_log), *extra_args,
        "--", str(fake), *fake_args,
    ]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                         text=True, timeout=240)
    return out, sup_log


@pytest.mark.slow
def test_stall_kill_and_resume(tmp_path):
    logdir = tmp_path / "logs"
    out, _ = _run_supervisor(tmp_path, [], ["--logdir", str(logdir)])
    assert out.returncode == 0, out.stdout + out.stderr
    assert "killing pid" in out.stdout, out.stdout
    launches = (logdir / "launches.txt").read_text().splitlines()
    assert len(launches) == 2
    assert "--resume" not in launches[0]
    # restart resumed from the newest checkpoint the first launch wrote
    assert "--resume" in launches[1]
    assert "1000.ckpt" in launches[1]


@pytest.mark.slow
def test_resume_latest_injects_on_first_launch(tmp_path):
    logdir = tmp_path / "logs"
    ckdir = logdir / "old_run" / "checkpoints"
    ckdir.mkdir(parents=True)
    (ckdir / "7000.ckpt").write_text("x")
    out, _ = _run_supervisor(tmp_path, ["--resume_latest"],
                             ["--logdir", str(logdir)])
    assert out.returncode == 0, out.stdout + out.stderr
    launches = (logdir / "launches.txt").read_text().splitlines()
    assert "--resume" in launches[0] and "7000.ckpt" in launches[0]
