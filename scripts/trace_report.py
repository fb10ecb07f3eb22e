"""Per-op breakdown of a jax.profiler trace, self-contained.

The reference repo has no profiling at all (SURVEY.md section 5); this tool
closes the loop on OUR side: ``jax.profiler`` writes TensorBoard "XSpace"
protos (``*.xplane.pb``), but the image has no tensorflow/tensorboard to
read them — so this decodes the protobuf WIRE FORMAT directly against the
public xplane.proto schema (tensorflow/tsl/profiler/protobuf/xplane.proto)
and aggregates per-op device time.

Usage:
  python scripts/trace_report.py <trace_dir_or_xplane.pb> [--top 40] [--json OUT]

Output: one line per device plane with total busy time, then the top-K ops
by summed duration (fraction of plane busy time). The op names are XLA
fusion/kernel names (e.g. 'fusion.123', 'custom-call.45' for Pallas/Mosaic
kernels), which is exactly the attribution VERDICT r3 item 6 asks for.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from collections import defaultdict

# ---------------------------------------------------------------------------
# minimal protobuf wire-format reader (no schema compile needed)
# ---------------------------------------------------------------------------


def _varint(buf: bytes, i: int):
    r, s = 0, 0
    while True:
        b = buf[i]
        r |= (b & 0x7F) << s
        i += 1
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf: bytes):
    """Yield (field_number, wire_type, value) for one message's bytes.
    value: int for varint/fixed, bytes for length-delimited."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:            # varint
            v, i = _varint(buf, i)
        elif wt == 1:          # 64-bit
            v = int.from_bytes(buf[i:i + 8], "little")
            i += 8
        elif wt == 2:          # length-delimited
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:          # 32-bit
            v = int.from_bytes(buf[i:i + 4], "little")
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt} at {i}")
        yield fno, wt, v


# ---------------------------------------------------------------------------
# xplane.proto walkers (field numbers from the public schema):
#   XSpace.planes = 1
#   XPlane: id=1 name=2 lines=3 event_metadata=4(map) stat_metadata=5(map)
#   XLine:  id=1 name=2 timestamp_ns=3 events=4
#   XEvent: metadata_id=1 offset_ps=2 duration_ps=3 stats=4
#   XEventMetadata: id=1 name=2
#   map entries: key=1 value=2
# ---------------------------------------------------------------------------


def parse_xplane(path: str):
    """-> list of planes: {name, lines: [{name, total_ps,
    ops: {op_name: total_ps}, n_events}]}.

    Durations are aggregated PER XLine: real TPU/host planes carry several
    overlapping lines (XLA Modules / XLA Ops / Steps), so a plane-level sum
    double-counts and dilutes per-op fractions (round-4 advisor finding).
    """
    with open(path, "rb") as f:
        space = f.read()
    planes = []
    for fno, wt, v in fields(space):
        if fno != 1 or wt != 2:
            continue
        name, raw_lines, emeta = "", [], {}
        for pf, pw, pv in fields(v):
            if pf == 2 and pw == 2:
                name = pv.decode("utf-8", "replace")
            elif pf == 3 and pw == 2:
                raw_lines.append(pv)
            elif pf == 4 and pw == 2:  # map<int64, XEventMetadata>
                k, meta_name = None, ""
                for mf, mw, mv in fields(pv):
                    if mf == 1:
                        k = mv
                    elif mf == 2 and mw == 2:
                        for ef, ew, ev in fields(mv):
                            if ef == 2 and ew == 2:
                                meta_name = ev.decode("utf-8", "replace")
                if k is not None:
                    emeta[k] = meta_name
        lines = []
        for line in raw_lines:
            # XLine: name=2, display_name=11, events=4
            lname, ldisp = "", ""
            ops = defaultdict(int)
            total = 0
            n_events = 0
            for lf, lw, lv in fields(line):
                if lf == 2 and lw == 2:
                    lname = lv.decode("utf-8", "replace")
                elif lf == 11 and lw == 2:
                    ldisp = lv.decode("utf-8", "replace")
                elif lf == 4 and lw == 2:
                    mid, dur = 0, 0
                    for ef, ew, ev in fields(lv):
                        if ef == 1 and ew == 0:
                            mid = ev
                        elif ef == 3 and ew == 0:
                            dur = ev
                    ops[emeta.get(mid, f"#{mid}")] += dur
                    total += dur
                    n_events += 1
            if n_events:
                lines.append({"name": ldisp or lname, "total_ps": total,
                              "ops": dict(ops), "n_events": n_events})
        planes.append({"name": name, "lines": lines})
    return planes


def is_device_plane(name: str) -> bool:
    low = name.lower()
    return ("tpu" in low or "gpu" in low or "/device:" in low) \
        and "host" not in low


def _pick_op_line(plane):
    """The line carrying per-op attribution: 'XLA Ops' when present (device
    planes), else the busiest line. Returns None when the plane is empty."""
    if not plane["lines"]:
        return None
    for ln in plane["lines"]:
        if ln["name"].strip().lower() == "xla ops":
            return ln
    return max(plane["lines"], key=lambda ln: ln["total_ps"])


def report(paths, top=40, all_lines=False):
    """One report row per (plane, line) when ``all_lines``; otherwise one
    row per plane from its op-attribution line (no cross-line
    double-counting)."""
    out = {"files": [os.path.basename(p) for p in paths], "planes": []}
    for path in paths:
        for plane in parse_xplane(path):
            rows = plane["lines"] if all_lines else (
                [ln for ln in [_pick_op_line(plane)] if ln is not None]
            )
            for ln in rows:
                ranked = sorted(ln["ops"].items(), key=lambda kv: -kv[1])
                total = ln["total_ps"] or 1
                out["planes"].append({
                    "plane": plane["name"],
                    "line": ln["name"],
                    "device": is_device_plane(plane["name"]),
                    "busy_ms": round(ln["total_ps"] / 1e9, 3),
                    "n_events": ln["n_events"],
                    "top_ops": [
                        {"op": k, "ms": round(v / 1e9, 3),
                         "frac": round(v / total, 4)}
                        for k, v in ranked[:top]
                    ],
                })
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", help="trace dir (searched recursively) or .pb")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--json", default=None, help="write the report here")
    ap.add_argument("--device-only", action="store_true",
                    help="only device (TPU/GPU) planes")
    ap.add_argument("--all-lines", action="store_true",
                    help="one row per XLine instead of only each plane's "
                         "op-attribution line")
    args = ap.parse_args(argv)

    if os.path.isdir(args.trace):
        paths = sorted(glob.glob(
            os.path.join(args.trace, "**", "*.xplane.pb"), recursive=True))
    else:
        paths = [args.trace]
    if not paths:
        print(f"no *.xplane.pb under {args.trace}", file=sys.stderr)
        return 1

    rep = report(paths, top=args.top, all_lines=args.all_lines)
    if args.device_only:
        rep["planes"] = [p for p in rep["planes"] if p["device"]]
    if args.json:
        os.makedirs(os.path.dirname(os.path.abspath(args.json)), exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(rep, f, indent=1)
        print(f"wrote {args.json}")
    for plane in rep["planes"]:
        print(f"\n== {plane['plane']} / {plane['line']}  "
              f"busy={plane['busy_ms']}ms events={plane['n_events']}")
        for op in plane["top_ops"][:args.top]:
            print(f"  {op['frac']:7.2%}  {op['ms']:10.3f}ms  {op['op']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
