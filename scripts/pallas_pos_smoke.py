"""Fast TPU smoke for the fused PosUpdate kernel at flagship shapes (dev utility)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from moldiff_tpu.models.denoiser import init_pos_update
from moldiff_tpu.ops.pallas_kernels import (
    pos_update_tpu_fused_bwd,
    _xla_pos_update,
)

b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
n, dn, de = 32, 256, 64
key = jax.random.key(0)
params = init_pos_update(key, dn, de, de, use_gate=True)
bf = lambda t: jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t)
params = bf(params)
ks = jax.random.split(key, 5)
h_node = jax.random.normal(ks[0], (b, n, dn), jnp.bfloat16)
h_edge = jax.random.normal(ks[1], (b, n, n, de), jnp.bfloat16)
pos = jax.random.normal(ks[2], (b, n, 3)) * 2.0
rel_vec = pos[:, :, None, :] - pos[:, None, :, :]
distance = jnp.linalg.norm(rel_vec, axis=-1)
t = jax.random.uniform(ks[3], (b, 1, 1))
mask = (jax.random.uniform(ks[4], (b, n, n)) > 0.3).astype(jnp.float32)
mask = mask * (1 - np.eye(n))[None]
args = (params, h_node, h_edge, rel_vec, distance, t, mask)


def loss_pl(p):
    return jnp.sum(pos_update_tpu_fused_bwd(p, *args[1:]) ** 2)


def loss_xla(p):
    return jnp.sum(_xla_pos_update(p, *args[1:]) ** 2)


t0 = time.time()
fwd = jax.jit(lambda p: pos_update_tpu_fused_bwd(p, *args[1:]))
out = jax.block_until_ready(fwd(params))
print(f"fwd OK {out.shape} {out.dtype} compile+run {time.time()-t0:.1f}s")
ref = jax.block_until_ready(jax.jit(
    lambda p: _xla_pos_update(p, *args[1:]))(params))
err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
print(f"fwd max rel err vs XLA: {err:.2e}")

t0 = time.time()
g = jax.jit(jax.grad(loss_pl))
gp = jax.block_until_ready(g(params))
print(f"bwd OK compile+run {time.time()-t0:.1f}s")
gx = jax.block_until_ready(jax.jit(jax.grad(loss_xla))(params))
errs = []
for (pa, a), (_, bb) in zip(
        jax.tree_util.tree_flatten_with_path(gx)[0],
        jax.tree_util.tree_flatten_with_path(gp)[0]):
    s = float(np.abs(np.asarray(a, np.float32)).max()) + 1e-9
    errs.append(float(np.abs(np.asarray(a, np.float32)
                             - np.asarray(bb, np.float32)).max()) / s)
print(f"bwd grad rel err vs XLA-bf16: mean {np.mean(errs):.3e} "
      f"max {np.max(errs):.3e}")
