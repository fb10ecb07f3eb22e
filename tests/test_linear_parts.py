"""linear_parts / mlp_parts: the implicit-concat decomposition used by the
denoiser gates must be numerically equivalent to the explicit concat
(`concat(parts) @ W == sum_i parts[i] @ W[rows_i]`, exact up to float
summation order). Guards the O(N^2) -> O(N) gate-matmul optimization in
models/denoiser.py (reference gates: /root/reference/models/graph.py:45-47,
133-141)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moldiff_tpu.models.nn import (
    init_linear,
    init_mlp,
    linear,
    linear_parts,
    mlp,
    mlp_parts,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_linear_parts_matches_concat(rng):
    key = jax.random.key(0)
    p = init_linear(key, 64 + 256 + 1, 96)
    b, n = 3, 5
    e = jnp.asarray(rng.normal(size=(b, n, n, 64)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(b, 1, n, 256)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(b, 1, 1, 1)), jnp.float32)

    full = jnp.concatenate(
        [
            e,
            jnp.broadcast_to(x, (b, n, n, 256)),
            jnp.broadcast_to(t, (b, n, n, 1)),
        ],
        axis=-1,
    )
    want = linear(p, full)
    got = linear_parts(p, (e, x, t), (64, 256, 1))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_linear_parts_size_mismatch_raises(rng):
    p = init_linear(jax.random.key(0), 8, 4)
    x = jnp.zeros((2, 5))
    with pytest.raises(AssertionError):
        linear_parts(p, (x,), (5,))


def test_mlp_parts_matches_concat(rng):
    key = jax.random.key(1)
    p = init_mlp(key, 64 + 256 + 1, 32, 48)
    b, n = 2, 6
    e = jnp.asarray(rng.normal(size=(b, n, n, 64)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(b, n, 1, 256)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(b, 1, 1, 1)), jnp.float32)

    full = jnp.concatenate(
        [
            e,
            jnp.broadcast_to(x, (b, n, n, 256)),
            jnp.broadcast_to(t, (b, n, n, 1)),
        ],
        axis=-1,
    )
    want = mlp(p, full)
    got = mlp_parts(p, (e, x, t), (64, 256, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_mlp_parts_grads_match(rng):
    """Gradients through the decomposition equal gradients through the
    concat (the sampler differentiates the bond-predictor gates)."""
    key = jax.random.key(2)
    p = init_mlp(key, 16 + 8 + 1, 4, 12)
    b, n = 2, 4
    e = jnp.asarray(rng.normal(size=(b, n, n, 16)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(b, 1, n, 8)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(b, 1, 1, 1)), jnp.float32)

    def loss_concat(e_):
        full = jnp.concatenate(
            [
                e_,
                jnp.broadcast_to(x, (b, n, n, 8)),
                jnp.broadcast_to(t, (b, n, n, 1)),
            ],
            axis=-1,
        )
        return jnp.sum(mlp(p, full) ** 2)

    def loss_parts(e_):
        return jnp.sum(mlp_parts(p, (e_, x, t), (16, 8, 1)) ** 2)

    g_want = jax.grad(loss_concat)(e)
    g_got = jax.grad(loss_parts)(e)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), atol=1e-4)


def test_linear_parts_pre_contribution(rng):
    """`pre=` path: precomputed leading product == computing it in place."""
    key = jax.random.key(3)
    p = init_linear(key, 64 + 256 + 1, 96)
    b, n = 3, 5
    e = jnp.asarray(rng.normal(size=(b, n, n, 64)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(b, 1, n, 256)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(b, 1, 1, 1)), jnp.float32)

    direct = linear_parts(p, (e, x, t), (64, 256, 1))
    pre = e @ p["w"][:64]
    via_pre = linear_parts(p, (x, t), (64, 256, 1), pre=pre)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via_pre),
                               rtol=1e-6, atol=1e-6)


def test_mlp_parts_pre_contribution(rng):
    key = jax.random.key(4)
    p = init_mlp(key, 64 + 256 + 1, 48, 96)
    b, n = 2, 4
    e = jnp.asarray(rng.normal(size=(b, n, n, 64)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(b, 1, n, 256)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(b, 1, 1, 1)), jnp.float32)

    direct = mlp_parts(p, (e, x, t), (64, 256, 1))
    pre = e @ p["layers"][0]["lin"]["w"][:64]
    via_pre = mlp_parts(p, (x, t), (64, 256, 1), pre=pre)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via_pre),
                               rtol=1e-5, atol=1e-5)
