"""FLOP accounting for MFU/roofline reporting.

Uses XLA's own cost model (``compiled.cost_analysis()['flops']``) so the
count tracks the real compiled HLO — fused, rematerialized, whatever — not a
hand-derived formula that drifts from the code. Peak numbers let bench.py
report sustained TFLOP/s as a fraction of the chip's bf16 peak.
"""
from __future__ import annotations

from typing import Optional

import jax

# bf16 peak FLOP/s per chip by device kind (public spec sheets)
PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5p": 459e12,
    "TPU v6e": 918e12,
}
DEFAULT_PEAK = 197e12  # assume v5e when the kind string is unrecognized


def device_peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_BF16.items():
        if k.lower() in kind.lower():
            return v
    return DEFAULT_PEAK


def compiled_flops(jitted_fn, *args, **kwargs) -> Optional[float]:
    """FLOPs of one invocation per XLA's cost analysis; None if the backend
    doesn't expose it (e.g. some remote-compile paths)."""
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):  # one entry per executable
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def mfu(flops_per_step: Optional[float], seconds_per_step: float) -> dict:
    """{'tflops_per_sec', 'pct_peak'} for the report line (empty if FLOPs
    unavailable)."""
    if not flops_per_step or seconds_per_step <= 0:
        return {}
    sustained = flops_per_step / seconds_per_step
    return {
        "tflops_per_sec": round(sustained / 1e12, 1),
        "pct_peak": round(100.0 * sustained / device_peak_flops(), 1),
    }
