import time, jax, jax.numpy as jnp, numpy as np
from moldiff_tpu.models.denoiser import init_node_block
from moldiff_tpu.ops.pallas_kernels import _pallas_node_block_aggregate, _xla_node_block_aggregate

key = jax.random.key(0)
b, n, dn, de = 128, 32, 256, 64
params = init_node_block(key, dn, de, dn, use_gate=True)
ks = jax.random.split(key, 4)
dt = jnp.bfloat16
x = jax.random.normal(ks[0], (b, n, dn), dt)
e = jax.random.normal(ks[1], (b, n, n, de), dt)
t = jax.random.uniform(ks[2], (b, 1, 1), jnp.float32)
mask = (jax.random.uniform(ks[3], (b, n, n)) > 0.1).astype(jnp.float32)
pcast = jax.tree.map(lambda w: w.astype(dt), params)

fns = {'xla': jax.jit(lambda p, *a: _xla_node_block_aggregate(p, *a))}
for grp in (1, 2, 4, 8):
    fns[f'pallas_g{grp}'] = jax.jit(lambda p, *a, _g=grp: _pallas_node_block_aggregate(p, *a, group=_g))

ref = None
for name, fn in fns.items():
    try:
        out = fn(pcast, x, e, t, mask); jax.block_until_ready(out)
    except Exception as ex:
        print(f'{name}: FAILED {type(ex).__name__}: {str(ex)[:120]}', flush=True)
        continue
    if ref is None: ref = np.asarray(out, np.float32)
    err = np.max(np.abs(np.asarray(out, np.float32) - ref))
    t0 = time.time()
    for _ in range(50): out = fn(pcast, x, e, t, mask)
    jax.block_until_ready(out)
    print(f'{name}: {(time.time()-t0)/50*1000:.2f} ms (err {err:.3f})', flush=True)
