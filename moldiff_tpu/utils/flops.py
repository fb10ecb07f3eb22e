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


def denoiser_forward_flops(
    batch: int,
    n_atoms: int,
    node_dim: int,
    edge_dim: int,
    num_blocks: int,
    num_gaussians: int = 16,
    update_edge: bool = True,
    update_pos: bool = True,
    use_gate: bool = True,
) -> float:
    """Analytic matmul FLOPs of one dense NodeEdgeNet forward
    (models/denoiser.py). Counts the O(N^2) pair-tensor matmuls exactly
    (2*m*k*n per dot); O(N)/O(1) side terms are <1% at these dims and are
    omitted. Used when the backend's cost analysis is unavailable (the
    axon remote-compile path reports bogus values)."""
    bn2 = float(batch) * n_atoms * n_atoms
    dn, de, g = node_dim, edge_dim, num_gaussians
    per_block = 0.0
    # edge_emb: [.., De+G] @ [De+G, De]
    per_block += 2 * (de + g if update_edge else g) * de
    # NodeBlock: edge_net MLP (De->Dn->Dn), msg_net (Dn->Dn),
    # gate edge part (De->Dn) + second layer (Dn->Dn)
    per_block += 2 * (de * dn + dn * dn) + 2 * dn * dn
    if use_gate:
        per_block += 2 * de * dn + 2 * dn * dn
    if update_edge:
        # EdgeBlock: 2 x BondFFN(De, Dn, inter=2De) + self/out linears.
        # The node-side linear runs on the broadcast [B,N,1,Dn] slab (O(N),
        # models/denoiser.py:201-215) — only bond-side matmuls are O(N^2).
        inter = 2 * de
        bffn = 2 * de * inter                     # bond_linear
        bffn += 2 * (inter * inter + inter * de)  # inter MLP
        if use_gate:
            bffn += 2 * (de * 32 + 32 * de)       # gate bond part + layer 2
        per_block += 2 * bffn + 2 * de * de + 2 * de * de
    if update_pos:
        # PosUpdate edge_lin = BondFFN(De, De_node_side, inter=Dn, out=1):
        # both bond and node inputs are full [B,N,N,De] pair tensors here
        # (node side is the left*right product, models/denoiser.py:281-309)
        per_block += 2 * de * dn + 2 * de * dn        # bond/node linears
        per_block += 2 * (dn * dn + dn * 1)           # inter MLP
        if use_gate:
            per_block += 2 * (de * 32 + de * 32 + 32 * 1)
    return per_block * bn2 * num_blocks


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
