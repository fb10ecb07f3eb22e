"""Analytic FLOP model validation (utils/flops.py).

XLA's cost_analysis counts a lax.scan body ONCE (not x trip count), so the
denoiser's stacked-block scan reports ~1 block's FLOPs regardless of depth —
bench.py therefore uses the analytic matmul count. This test pins the
analytic per-block count to XLA's own number for the scan body."""
import jax
import jax.numpy as jnp
import pytest

from moldiff_tpu.models.denoiser import init_node_edge_net, node_edge_net
from moldiff_tpu.utils.flops import denoiser_forward_flops, mfu


def test_analytic_matches_xla_per_block():
    b, n, dn, de, blocks = 2, 16, 64, 32, 3
    params, static = init_node_edge_net(
        jax.random.key(0), dn, de, num_blocks=blocks, cutoff=15,
        use_gate=True, remat=False,
    )
    h_node = jnp.zeros((b, n, dn))
    pos = jnp.zeros((b, n, 3))
    h_edge = jnp.zeros((b, n, n, de))
    t = jnp.zeros((b, 1, 1))
    pm = jnp.ones((b, n, n))

    fn = jax.jit(lambda p, hn, ps, he: node_edge_net(
        p, static, hn, ps, he, t, t, pm, remat=False,
    ))
    ca = fn.lower(params, h_node, pos, h_edge).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    xla_body = float(ca.get("flops", 0))
    if xla_body <= 0:
        pytest.skip("backend exposes no cost analysis")
    analytic_per_block = denoiser_forward_flops(b, n, dn, de, 1)
    # XLA counts extra elementwise/reduction work; the matmul-only analytic
    # count must sit just below it
    ratio = analytic_per_block / xla_body
    assert 0.6 < ratio <= 1.05, (analytic_per_block, xla_body)


def test_mfu_fields():
    out = mfu(1e12, 0.5)  # 2 TFLOP/s sustained
    assert out["tflops_per_sec"] == pytest.approx(2.0)
    assert 0 < out["pct_peak"] < 100
    assert mfu(None, 1.0) == {}
