"""Training supervisor: stall detection + automatic restart-with-resume.

The reference's only resilience is a per-iteration RuntimeError skip
(`/root/reference/scripts/train_drug3d.py:169-173`). On shared TPU runtimes
a training step can wedge indefinitely when a device RPC is dropped (the
process stays alive with zero CPU progress). This supervisor runs the train
CLI as a child process, watches its log for progress, and on a stall kills
the child and relaunches it with ``--resume`` from the newest checkpoint.

Usage:
  python scripts/train_supervisor.py --stall_secs 600 --max_restarts 5 -- \
      scripts/train_drug3d.py --config configs/train/train_MolDiff.yml \
      --logdir ./logs
"""
from __future__ import annotations

import argparse
import glob
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def newest_checkpoint(logdir: str):
    ckpts = glob.glob(os.path.join(logdir, "*", "checkpoints", "*.ckpt"))
    if not ckpts:
        return None
    return max(ckpts, key=os.path.getmtime)


def run_once(cmd, log_path: str, stall_secs: int) -> int:
    """Run the child; return exit code, or -1 if killed for stalling."""
    with open(log_path, "ab") as logf:
        child = subprocess.Popen(cmd, stdout=logf, stderr=subprocess.STDOUT,
                                 start_new_session=True)
        last_size = -1
        last_progress = time.time()
        while True:
            rc = child.poll()
            if rc is not None:
                return rc
            time.sleep(10)
            try:
                size = os.path.getsize(log_path)
            except OSError:
                size = -1
            if size != last_size:
                last_size = size
                last_progress = time.time()
            elif time.time() - last_progress > stall_secs:
                print(f"[supervisor] no log progress for {stall_secs}s; "
                      f"killing pid {child.pid}", flush=True)
                os.killpg(os.getpgid(child.pid), signal.SIGKILL)
                child.wait()
                return -1


def main(argv=None):
    from moldiff_tpu.utils.misc import force_platform_from_env
    force_platform_from_env()  # honor JAX_PLATFORMS despite sitecustomize
    ap = argparse.ArgumentParser()
    ap.add_argument("--stall_secs", type=int, default=600)
    ap.add_argument("--max_restarts", type=int, default=10)
    ap.add_argument("--supervisor_log", default="supervisor.log")
    ap.add_argument("--resume_latest", action="store_true",
                    help="inject --resume <newest ckpt> on the FIRST launch "
                         "too (picking up a run the supervisor didn't start)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- then the train command (script + args)")
    args = ap.parse_args(argv)
    cmd = [c for c in args.cmd if c != "--"]
    assert cmd, "pass the training command after --"
    if not cmd[0].endswith(".py"):
        raise SystemExit(f"expected a python script, got {cmd[0]}")
    # find the --logdir value for resume discovery
    logdir = "./logs"
    for i, c in enumerate(cmd):
        if c == "--logdir" and i + 1 < len(cmd):
            logdir = cmd[i + 1]

    restarts = 0
    while True:
        full = [sys.executable] + cmd
        ckpt = newest_checkpoint(logdir)
        if (restarts > 0 or args.resume_latest) and ckpt and "--resume" not in full:
            full += ["--resume", ckpt]
            print(f"[supervisor] resuming from {ckpt}", flush=True)
        rc = run_once(full, args.supervisor_log, args.stall_secs)
        if rc == 0:
            print("[supervisor] training finished", flush=True)
            return 0
        restarts += 1
        print(f"[supervisor] child exited rc={rc}; restart "
              f"{restarts}/{args.max_restarts}", flush=True)
        if restarts >= args.max_restarts:
            print("[supervisor] giving up", flush=True)
            return 1
        time.sleep(5)


if __name__ == "__main__":
    raise SystemExit(main())
