"""Driver-entry contract tests.

The driver calls ``__graft_entry__.dryrun_multichip(8)`` on a machine with ONE
real TPU chip. ``dryrun_multichip`` must self-provision an 8-device virtual
CPU mesh in a subprocess when the current process sees fewer devices
(VERDICT r1 missing #1). These tests pin both legs of that contract.
"""
import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_inprocess_with_enough_devices():
    """With >= n devices visible (conftest provisions 8 CPU), the in-process
    leg runs the mesh train step directly."""
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    assert len(jax.devices()) >= 4
    g.dryrun_multichip(4)


@pytest.mark.slow
def test_dryrun_self_provisions_when_devices_missing():
    """From a process that sees ONE device (the driver scenario),
    dryrun_multichip(8) must spawn the virtual-mesh subprocess and succeed."""
    env = dict(os.environ)
    # Simulate the driver: one CPU device, no host-platform-count flag.
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');\n"
         "assert len(jax.devices()) == 1, jax.devices()\n"
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "one train step OK" in proc.stdout
