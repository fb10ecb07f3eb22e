"""bench.py auxiliary-mode tests (the driver runs `python bench.py` on real
TPU; these cover the CPU-checkable modes)."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_mesh_mode_from_one_device():
    """`bench.py mesh 8` from a 1-device process must self-provision the
    virtual CPU mesh and report identical sharded vs single-device
    molecules (BASELINE.json configs item 5)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "mesh", "8"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["metric"] == "sampler_mesh_match"
    assert out["value"] == 1.0
    assert out["devices"] == 8
