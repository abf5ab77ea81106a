"""Round-2 microbench, take 2: measure inside one jit via lax.scan chaining
(defeats async dispatch pipelining; numbers are true device time / iter)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

P = 2_088_960
N = 20  # scan length


def t_scan(name, op, init, *consts):
    """Time op(carry, *consts) chained N times inside one jit."""

    def run(init, *consts):
        def body(c, _):
            return op(c, *consts), None

        out, _ = jax.lax.scan(body, init, None, length=N)
        return out

    f = jax.jit(run)
    out = jax.block_until_ready(f(init, *consts))
    reps = 3
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(f(init, *consts))
        best = min(best, (time.time() - t0) / N * 1000)
    print(f"{name}: {best:.3f} ms/iter", flush=True)
    return out


key = jax.random.PRNGKey(0)

print("== gather (chained) ==")
tab = jnp.asarray(np.random.randint(0, 255, (20 << 20, 4), np.uint8))
idx_rand = jax.random.randint(key, (P,), 0, 20 << 20, jnp.int32)
# profile-like: 90% of pixels share one index, 10% clustered
idx_dup = jnp.where(jax.random.uniform(key, (P,)) < 0.9, 0, idx_rand)


def g_op(c, tab, idx):
    # carry perturbs indices so scan can't hoist the gather
    i = (idx + c.astype(jnp.int32)) % (20 << 20)
    return tab[i][:, 0].astype(jnp.float32) * 1e-9 + c * 0.0 + jnp.float32(1.0)


c0 = jnp.zeros((P,))
t_scan("gather u8x4 80MB random", g_op, c0, tab, idx_rand)
t_scan("gather u8x4 80MB 90%dup", g_op, c0, tab, idx_dup)

tab_small = jnp.asarray(np.random.randint(0, 255, (1 << 20, 4), np.uint8))


def g_op_small(c, tab, idx):
    i = (idx + c.astype(jnp.int32)) % (1 << 20)
    return tab[i][:, 0].astype(jnp.float32) * 1e-9 + jnp.float32(1.0)


t_scan("gather u8x4 4MB random", g_op_small, c0, tab_small, idx_rand)

print("== sort (chained) ==")
keys0 = jax.random.randint(key, (65536,), 0, 1 << 27, jnp.int32)


def s_op(c, _):
    return jnp.sort(c ^ 12345), None


def s_run(k):
    out, _ = jax.lax.scan(lambda c, x: s_op(c, x), k, None, length=N)
    return out


f = jax.jit(s_run)
jax.block_until_ready(f(keys0))
t0 = time.time()
jax.block_until_ready(f(keys0))
print(f"sort i32 64k: {(time.time()-t0)/N*1000:.3f} ms/iter")

for n in (8192, 16384):
    kk = jax.random.randint(key, (n,), 0, 1 << 27, jnp.int32)
    f = jax.jit(s_run)
    jax.block_until_ready(f(kk))
    t0 = time.time()
    jax.block_until_ready(f(kk))
    print(f"sort i32 {n}: {(time.time()-t0)/N*1000:.3f} ms/iter")

print("== onehot fetch (chained) ==")
mat0 = jax.random.randint(key, (P,), 0, 19, jnp.int32).astype(jnp.float32)
table = jax.random.normal(key, (19, 38))


def oh_op(c, table):
    m = c % 19.0
    onehot = (m[:, None] == jnp.arange(19, dtype=jnp.float32)[None, :]).astype(jnp.float32)
    out = jnp.dot(onehot, table)
    return c + out[:, 0] * 1e-9


t_scan("onehot fetch f32", oh_op, mat0, table)


def tg_op(c, table):
    m = (c % 19.0).astype(jnp.int32)
    out = table[m]
    return c + out[:, 0] * 1e-9


t_scan("table[mat] small gather", tg_op, mat0, table)

print("== elementwise (P,3) traffic (chained) ==")
img = jax.random.normal(key, (P, 3))


def ew_op(c, _):
    return c * 1.0001 + 0.001


t_scan("1 elementwise pass (P,3)", ew_op, img, img)


def toon_op(c, _):
    # 8-segment piecewise eval like eval_toon: 8 wheres on (P,3)
    x = c[:, 0]
    f = jnp.clip(x, 0.0, 1.0) * 8.0
    seg = jnp.minimum(jnp.floor(f), 7.0)
    out = jnp.zeros((P, 3))
    tt = (f - seg)[:, None]
    for s in range(8):
        out = jnp.where((seg == s)[:, None], tt * s, out)
    return c + out * 1e-9


t_scan("eval_toon-like (8 wheres)", toon_op, img, img)
