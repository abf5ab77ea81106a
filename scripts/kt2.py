import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import sys
import time

import jax.numpy as jnp
import numpy as np

from reze_tpu.render import raster as R
from reze_tpu.kernels import raster_tpu as RT

rng = np.random.default_rng(0)
LOG = open("/tmp/kt2.log", "a")


def log(*a):
    print(*a, file=LOG, flush=True)


def case(T, maxb, W=512, H=512, empty=False):
    global rng
    c2 = rng.uniform(-0.95, 0.95, (T, 1, 2)) + rng.uniform(-0.03, 0.03, (T, 3, 2))
    z2 = rng.uniform(0.1, 0.9, (T, 1, 1)) * np.ones((1, 3, 1))
    corners = jnp.asarray(
        np.concatenate([c2, z2, np.ones((T, 3, 1))], -1).astype(np.float32)
    )
    tri = R.setup_triangles(corners, jnp.ones(T, bool), W, H, R.CULL_NONE)
    bx, by = W // RT.TILE_W, H // RT.TILE_H
    tabs = RT.pack_tables(
        tri, jnp.zeros((T, 3, 2)), jnp.zeros((T, 3, 3)), jnp.zeros(T, jnp.int32),
        by, bx, max_bins_per_tri=maxb,
    )
    if empty:
        tabs = tabs._replace(counts=jnp.zeros_like(tabs.counts))
    zb = jnp.full((bx * by, 4, RT.TILE_H, RT.TILE_W), 1.0)
    log(f"CASE T={T} maxb={maxb} ids={tabs.ids.shape} empty={empty}")
    try:
        f = jax.jit(lambda z: RT.raster_pass_tpu(tabs, z, bx=bx, depth_write=True))
        t0 = time.time()
        out = f(zb)
        jax.block_until_ready(out)
        log(f"  OK compile {time.time()-t0:.0f}s")
        t0 = time.time()
        for _ in range(20):
            out = f(zb)
        jax.block_until_ready(out)
        log(f"  run {(time.time()-t0)/20*1000:.2f} ms")
    except Exception as e:
        log("  FAIL", str(e)[:120].replace("\n", " "))


for spec in sys.argv[1:]:
    parts = spec.split(",")
    t, maxb = int(parts[0]), int(parts[1])
    size = int(parts[2]) if len(parts) > 2 and parts[2].isdigit() else 512
    empty = "empty" in parts
    case(t, maxb, W=size, H=size, empty=empty)
