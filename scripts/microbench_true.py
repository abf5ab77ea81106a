"""TRUE device-time microbenchmarks via the scan-delta harness."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from tbench import bench_op

P = 2_088_960
key = jax.random.PRNGKey(0)

print("== calibration ==")
a = jax.random.normal(key, (2048, 2048))
bench_op("matmul 2048^3 f32 (17.2 GF)", lambda c, a: jnp.tanh(c @ a), a, a)

img = jax.random.normal(key, (P, 3))
bench_op("sin pass (P,3) 50MB rw", lambda c: jnp.sin(c) * 1.0001, img)

print("== gather vs table size / idx count ==")
idx = jax.random.randint(key, (P,), 0, 1 << 20, jnp.int32).astype(jnp.float32)
for mb, rows in [(1, 1 << 18), (4, 1 << 20), (16, 1 << 22), (80, 20 << 20)]:
    tab = jnp.asarray(np.random.randint(0, 255, (rows, 4), np.uint8))

    def g(c, tab, rows=rows):
        i = jnp.abs(c).astype(jnp.int32) % rows
        return c + tab[i][:, 0].astype(jnp.float32) * 1e-9

    bench_op(f"gather u8x4 {mb}MB tab, P idx", g, idx * (rows / (1 << 20)), tab)

tab80 = jnp.asarray(np.random.randint(0, 255, (20 << 20, 4), np.uint8))
for frac, cnt in [(2, P // 2), (4, P // 4), (8, P // 8)]:
    def g(c, tab):
        i = jnp.abs(c).astype(jnp.int32) % (20 << 20)
        return c + tab[i][:, 0].astype(jnp.float32) * 1e-9

    bench_op(f"gather u8x4 80MB tab, P/{frac} idx", g, idx[:cnt] * 20, tab80)

# f32 gather from a (rows,) table
tabf = jax.random.normal(key, (20 << 20,))
bench_op("gather f32 80MB tab, P idx",
         lambda c, tab: c + tab[jnp.abs(c).astype(jnp.int32) % (20 << 20)] * 1e-9,
         idx * 20, tabf)

print("== sort ==")
for n in (8192, 16384, 65536):
    k0 = jax.random.randint(key, (n,), 0, 1 << 27, jnp.int32)

    def s(c):
        return jnp.sort(c ^ 917) + 1

    bench_op(f"sort i32 {n}", s, k0)

print("== one-hot fetch (P,19)@(19,38) ==")
mat0 = jax.random.randint(key, (P,), 0, 19, jnp.int32).astype(jnp.float32)
table = jax.random.normal(key, (19, 38))


def oh(c, table):
    m = jnp.abs(c) % 19.0
    onehot = (jnp.floor(m)[:, None] == jnp.arange(19, dtype=jnp.float32)[None, :]).astype(jnp.float32)
    return c + jnp.dot(onehot, table)[:, 0] * 1e-9


bench_op("onehot fetch f32", oh, mat0, table)


def tg(c, table):
    m = (jnp.abs(c) % 19.0).astype(jnp.int32)
    return c + table[m][:, 0] * 1e-9


bench_op("table[mat] gather 19 rows", tg, mat0, table)

print("== scatter-add (physics pattern) ==")
src0 = jax.random.normal(key, (406, 3))
sidx = jax.random.randint(key, (406,), 0, 257, jnp.int32)


def sc(c, sidx):
    tgt = jnp.zeros((257, 3))
    for _ in range(12):
        tgt = tgt.at[sidx].add(c)
    return c + tgt[:406 - 257 if False else 0] * 0 + tgt.sum() * 1e-12


def sc2(c, sidx):
    tgt = jnp.zeros((257, 3))
    for _ in range(12):
        tgt = tgt.at[sidx].add(c * 1.0001)
    return c * 1.0 + tgt.sum() * 1e-12


bench_op("12 scatter-adds (406->257,3)", sc2, src0, sidx)
