"""Decisive: (1) is the 10.5ms albedo gather just constant-upload through the
tunnel (pass atlas as arg vs closure)? (2) are sub-0.1ms chained numbers real
(matmul with forced materialization)?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

P = 2_088_960
key = jax.random.PRNGKey(0)

# ---- matmul reality check: materialize a scalar each iteration ----
a = jax.random.normal(key, (2048, 2048))


def mm_chain(a, n):
    def body(c, _):
        c2 = jnp.tanh(c @ a)
        return c2, c2[0, 0]

    out, traces = jax.lax.scan(body, a, None, length=n)
    return out[0, 0], traces


f = jax.jit(mm_chain, static_argnums=1)
r = jax.block_until_ready(f(a, 5))
for n in (5, 40):
    r = jax.block_until_ready(f(a, n))  # warm
    t0 = time.time()
    r = jax.block_until_ready(f(a, n))
    dt = time.time() - t0
    print(f"matmul chain n={n}: total {dt*1000:.2f} ms -> {(dt)/n*1000:.3f} ms/iter, out={float(r[0]):.4f}")
# delta method: (t40 - t5)/35 isolates per-iter from dispatch overhead

# ---- gather: closure constant vs argument ----
tab_np = np.random.randint(0, 255, (20 << 20, 4), np.uint8)
tab_dev = jax.device_put(jnp.asarray(tab_np))
idx = jax.random.randint(key, (P,), 0, 20 << 20, jnp.int32)

g_arg = jax.jit(lambda tab, i: tab[i][:, :3].astype(jnp.float32))
g_clo = jax.jit(lambda i: tab_dev[i][:, :3].astype(jnp.float32))

for name, f, args in [("gather ARG", g_arg, (tab_dev, idx)), ("gather CLOSURE", g_clo, (idx,))]:
    out = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(20):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/20*1000:.3f} ms/iter")

# ---- how big are the frame function's captured constants? ----
from reze_tpu.core.build import load_model
from reze_tpu.core.types import EngineConfig

built = load_model("/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx", EngineConfig())
m = built.arrays
tot = 0
for path, leaf in jax.tree_util.tree_flatten_with_path(m)[0]:
    tot += leaf.size * leaf.dtype.itemsize
print(f"ModelArrays total bytes: {tot/1e6:.1f} MB")
