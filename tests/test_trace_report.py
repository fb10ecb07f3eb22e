"""scripts/trace_report.py: first-party XSpace wire-format decoder.

Builds a tiny XSpace protobuf BY HAND (wire format per the public
xplane.proto schema) and checks the per-op aggregation; also round-trips
a real jax.profiler trace on CPU (slow lane).
"""
import os
import struct
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.trace_report import is_device_plane, parse_xplane, report


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(fno: int, wt: int, payload) -> bytes:
    tag = _varint((fno << 3) | wt)
    if wt == 0:
        return tag + _varint(payload)
    if wt == 2:
        return tag + _varint(len(payload)) + payload
    raise ValueError(wt)


def _xevent(metadata_id: int, dur_ps: int) -> bytes:
    return _field(1, 0, metadata_id) + _field(3, 0, dur_ps)


def _xline(events) -> bytes:
    return b"".join(_field(4, 2, e) for e in events)


def _event_meta(mid: int, name: str) -> bytes:
    meta = _field(1, 0, mid) + _field(2, 2, name.encode())
    return _field(1, 0, mid) + _field(2, 2, meta)  # map entry {key, value}


def _xplane(name: str, lines, emeta) -> bytes:
    return (_field(2, 2, name.encode())
            + b"".join(_field(4, 2, m) for m in emeta)
            + b"".join(_field(3, 2, ln) for ln in lines))


def test_decoder_aggregates_ops(tmp_path):
    plane = _xplane(
        "/device:TPU:0",
        lines=[_xline([_xevent(1, 5_000_000), _xevent(2, 3_000_000),
                       _xevent(1, 2_000_000)])],
        emeta=[_event_meta(1, "fusion.42"), _event_meta(2, "custom-call.7")],
    )
    space = _field(1, 2, plane)
    path = tmp_path / "t.xplane.pb"
    path.write_bytes(space)

    planes = parse_xplane(str(path))
    assert len(planes) == 1
    p = planes[0]
    assert p["name"] == "/device:TPU:0"
    assert p["n_events"] == 3
    assert p["ops"] == {"fusion.42": 7_000_000, "custom-call.7": 3_000_000}
    assert is_device_plane(p["name"])

    rep = report([str(path)], top=10)
    top = rep["planes"][0]["top_ops"]
    assert top[0]["op"] == "fusion.42"
    assert top[0]["frac"] == pytest.approx(0.7)


def test_unknown_metadata_id_is_labeled(tmp_path):
    plane = _xplane("/host:CPU", lines=[_xline([_xevent(9, 1_000_000)])],
                    emeta=[])
    (tmp_path / "u.xplane.pb").write_bytes(_field(1, 2, plane))
    p = parse_xplane(str(tmp_path / "u.xplane.pb"))[0]
    assert p["ops"] == {"#9": 1_000_000}
    assert not is_device_plane(p["name"])


@pytest.mark.slow
def test_roundtrip_real_cpu_trace(tmp_path):
    """End-to-end: capture a real jax.profiler trace on CPU in a fresh
    subprocess and decode it with the CLI."""
    code = (
        "import jax, jax.numpy as jnp\n"
        "jax.config.update('jax_platforms','cpu')\n"
        "f = jax.jit(lambda x: (x @ x).sum())\n"
        "x = jnp.ones((256,256)); f(x).block_until_ready()\n"
        f"jax.profiler.start_trace({str(tmp_path)!r})\n"
        "f(x).block_until_ready()\n"
        "jax.profiler.stop_trace()\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                   check=True)
    out = subprocess.run(
        [sys.executable, "scripts/trace_report.py", str(tmp_path),
         "--top", "5"],
        cwd=REPO, env=env, capture_output=True, text=True, check=True)
    assert "busy=" in out.stdout
