"""Dev: validate+benchmark raster kernel v2 against v1."""

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import sys
import time

import jax.numpy as jnp
import numpy as np

from reze_tpu.render import raster as R
from reze_tpu.kernels import raster_tpu as RT
import raster_tpu2_experiment as RT2  # moved out of the package (negative result)

LOG = open("/tmp/raster_v2.log", "a")


def log(*a):
    print(*a, file=LOG, flush=True)
    print(*a, flush=True)


rng = np.random.default_rng(0)


def make(T, W, H):
    c2 = rng.uniform(-0.95, 0.95, (T, 1, 2)) + rng.uniform(-0.04, 0.04, (T, 3, 2))
    z2 = rng.uniform(0.1, 0.9, (T, 1, 1)) * np.ones((1, 3, 1))
    corners = jnp.asarray(
        np.concatenate([c2, z2, np.ones((T, 3, 1))], -1).astype(np.float32)
    )
    tri = R.setup_triangles(corners, jnp.ones(T, bool), W, H, R.CULL_NONE)
    bx, by = W // RT.TILE_W, H // RT.TILE_H
    cuv = jnp.asarray(rng.uniform(0, 1, (T, 3, 2)).astype(np.float32))
    cnrm = jnp.asarray(rng.normal(size=(T, 3, 3)).astype(np.float32))
    tm = jnp.asarray(rng.integers(0, 7, T).astype(np.int32))
    tabs = RT.pack_tables(tri, cuv, cnrm, tm, by, bx)
    zb = jnp.full((bx * by, 4, RT.TILE_H, RT.TILE_W), 1.0)
    return tabs, zb, bx


def run(fn, tabs, zb, bx, name, n=10):
    f = jax.jit(lambda z: fn(tabs, z, bx=bx, depth_write=True))
    t0 = time.time()
    out = f(zb)
    jax.block_until_ready(out)
    log(f"  {name}: compile {time.time()-t0:.0f}s")
    t0 = time.time()
    for _ in range(n):
        out = f(zb)
    jax.block_until_ready(out)
    log(f"  {name}: {(time.time()-t0)/n*1000:.2f} ms")
    return out


# correctness: small case
tabs, zb, bx = make(300, 512, 512)
log(f"T=300 binned={int(np.asarray(tabs.counts).sum())}")
z1, g1 = run(RT.raster_pass_tpu, tabs, zb, bx, "v1")
z2, g2 = run(RT2.raster_pass_tpu2, tabs, zb, bx, "v2")
zd = np.abs(np.asarray(z1) - np.asarray(z2))
m1 = np.asarray(g1)[:, RT.CH_MAT]
m2 = np.asarray(g2)[:, RT.CH_MAT]
cov1 = np.asarray(g1)[:, RT.CH_COVER]
cov2 = np.asarray(g2)[:, RT.CH_COVER]
iw1 = np.asarray(g1)[:, RT.CH_IW]
iw2 = np.asarray(g2)[:, RT.CH_IW]
log(f"zbuf max diff: {zd.max():.2e}")
log(f"mat match: {(m1 == m2).mean():.5f} cover diff max: {np.abs(cov1-cov2).max():.2e}")
log(f"iw diff max at interior: {np.abs(iw1-iw2)[(m1==m2)&(m1>=0)].max() if ((m1==m2)&(m1>=0)).any() else -1:.2e}")

# perf scaling
for T in [int(a) for a in sys.argv[1:]] or [8000, 20000, 40000]:
    tabs, zb, bx = make(T, 512, 512)
    log(f"T={T} binned={int(np.asarray(tabs.counts).sum())}")
    run(RT2.raster_pass_tpu2, tabs, zb, bx, "v2")
    run(RT.raster_pass_tpu, tabs, zb, bx, "v1")
