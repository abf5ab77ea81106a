"""Round-2 microbenchmarks: gather rate, sort rate, raster variants, scatter.

Measured inside one jit each (per-dispatch tunnel latency ~0.5-1ms).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

P = 2_088_960  # 1080p padded pixel count


def t(name, f, *a, n=30):
    out = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1000:.3f} ms", flush=True)
    return out


key = jax.random.PRNGKey(0)

# ---- 1. gather rate vs table size / coherence / width ----
print("== gather ==")
for tab_mb, n_rows in [(4, 1 << 20), (16, 1 << 22), (80, 20 << 20)]:
    tab = jnp.asarray(np.random.randint(0, 255, (n_rows, 4), np.uint8))
    idx_r = jax.random.randint(key, (P,), 0, n_rows, jnp.int32)
    idx_c = jnp.sort(idx_r)  # spatially coherent
    g = jax.jit(lambda tab, i: tab[i])
    t(f"gather u8x4 {tab_mb}MB random", g, tab, idx_r)
    t(f"gather u8x4 {tab_mb}MB sorted", g, tab, idx_c)

tab32 = jnp.asarray(np.random.randint(0, 2**31 - 1, (20 << 20,), np.int32))
t("gather i32 80MB random", jax.jit(lambda tab, i: tab[i]), tab32, idx_r)
# fewer indices, wider rows
tab8 = jnp.asarray(np.random.randint(0, 255, (20 << 20, 8), np.uint8))
idx4 = idx_r[: P // 4]
t("gather u8x8 80MB P/4 idx", jax.jit(lambda tab, i: tab[i]), tab8, idx4)
t("gather u8x4 80MB P/4 idx", jax.jit(lambda tab, i: tab[i]),
  jnp.asarray(np.random.randint(0, 255, (20 << 20, 4), np.uint8)), idx4)
half = idx_r[: P // 2]
t("gather u8x4 80MB P/2 idx", jax.jit(lambda tab, i: tab[i]),
  jnp.asarray(np.random.randint(0, 255, (20 << 20, 4), np.uint8)), half)

# ---- 2. sort rate ----
print("== sort ==")
for n in (8192, 16384, 65536, 131072):
    keys = jax.random.randint(key, (n,), 0, 1 << 27, jnp.int32)
    t(f"sort i32 {n}", jax.jit(jnp.sort), keys)

# searchsorted cost (used twice per pack)
keys64 = jnp.sort(jax.random.randint(key, (65536,), 0, 510, jnp.int32))
bins = jnp.arange(510, dtype=jnp.int32)
t("searchsorted 510 in 64k x2", jax.jit(
    lambda k, b: (jnp.searchsorted(k, b), jnp.searchsorted(k, b, side="right"))), keys64, bins)

# ---- 3. scatter-add rate (physics pattern) ----
print("== scatter ==")
src = jax.random.normal(key, (406, 3))
tgt = jnp.zeros((257, 3))
sidx = jax.random.randint(key, (406,), 0, 257, jnp.int32)


def many_scatter(tgt, src, sidx):
    for _ in range(48):
        tgt = tgt.at[sidx].add(src)
    return tgt


t("48 scatter-adds (406->257,3)", jax.jit(many_scatter), tgt, src, sidx)
t("48 gathers (257<-406,3)", jax.jit(
    lambda s, i: sum(s[i] for _ in range(48))), src, sidx[:257])

# ---- 4. one-hot matmul on 2M px ----
print("== onehot ==")
mat_f = jax.random.randint(key, (P,), 0, 19, jnp.int32).astype(jnp.float32)
table = jax.random.normal(key, (19, 38))


def fetch(mat_f, table):
    onehot = (mat_f[:, None] == jnp.arange(19, dtype=jnp.float32)[None, :]).astype(jnp.float32)
    return jnp.dot(onehot, table)


t("onehot fetch f32 (P,19)@(19,38)", jax.jit(fetch), mat_f, table)


def fetch_bf16(mat_f, table):
    onehot = (mat_f[:, None] == jnp.arange(19, dtype=jnp.float32)[None, :]).astype(jnp.bfloat16)
    return jnp.dot(onehot, table.astype(jnp.bfloat16), preferred_element_type=jnp.float32)


t("onehot fetch bf16", jax.jit(fetch_bf16), mat_f, table)
# direct small gather instead
t("table[mat] gather (P idx, 19 rows)", jax.jit(lambda m, tb: tb[m.astype(jnp.int32)]), mat_f, table)

# ---- 5. bloom-ish image traffic at 1080p ----
print("== image traffic ==")
img = jax.random.normal(key, (1080, 1920, 3))
t("1 elementwise pass (H,W,3)", jax.jit(lambda x: x * 1.5 + 0.1), img)
t("2x2 avg downsample", jax.jit(
    lambda x: x.reshape(540, 2, 960, 2, 3).mean((1, 3))), img)
