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


def _xline(events, name: str = "") -> bytes:
    head = _field(2, 2, name.encode()) if name else b""
    return head + b"".join(_field(4, 2, e) for e in events)


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
    assert len(p["lines"]) == 1
    ln = p["lines"][0]
    assert ln["n_events"] == 3
    assert ln["ops"] == {"fusion.42": 7_000_000, "custom-call.7": 3_000_000}
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
    assert p["lines"][0]["ops"] == {"#9": 1_000_000}
    assert not is_device_plane(p["name"])


def test_multi_line_planes_do_not_double_count(tmp_path):
    """Round-4 advisor finding: device planes carry overlapping XLines (XLA
    Modules / XLA Ops / Steps); summing across lines double-counts busy time
    and dilutes per-op fractions. The report must aggregate per line and
    pick the 'XLA Ops' line for attribution."""
    module_line = _xline([_xevent(3, 10_000_000)], name="XLA Modules")
    ops_line = _xline([_xevent(1, 6_000_000), _xevent(2, 4_000_000)],
                      name="XLA Ops")
    steps_line = _xline([_xevent(4, 10_000_000)], name="Steps")
    plane = _xplane(
        "/device:TPU:0", lines=[module_line, ops_line, steps_line],
        emeta=[_event_meta(1, "fusion.1"), _event_meta(2, "fusion.2"),
               _event_meta(3, "jit_train_step"), _event_meta(4, "step0")],
    )
    path = tmp_path / "m.xplane.pb"
    path.write_bytes(_field(1, 2, plane))

    p = parse_xplane(str(path))[0]
    assert {ln["name"] for ln in p["lines"]} == {
        "XLA Modules", "XLA Ops", "Steps"}

    rep = report([str(path)], top=10)
    assert len(rep["planes"]) == 1          # one row: the XLA Ops line
    row = rep["planes"][0]
    assert row["line"] == "XLA Ops"
    assert row["busy_ms"] == pytest.approx(0.01)   # 1e7 ps = 0.01 ms
    assert row["top_ops"][0]["op"] == "fusion.1"
    assert row["top_ops"][0]["frac"] == pytest.approx(0.6)

    rep_all = report([str(path)], top=10, all_lines=True)
    assert len(rep_all["planes"]) == 3


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
         "--top", "5", "--all-lines"],
        cwd=REPO, env=env, capture_output=True, text=True, check=True)
    assert "busy=" in out.stdout
