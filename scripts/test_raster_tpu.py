"""Dev: validate the Pallas raster kernel against the XLA rasterizer."""

import time
import jax as _jax_cfg
_jax_cfg.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
_jax_cfg.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax
import jax.numpy as jnp
import numpy as np

from reze_tpu.render import raster as R
from reze_tpu.kernels import raster_tpu as RT

rng = np.random.default_rng(0)
T = 200
centers = rng.uniform(-0.9, 0.9, (T, 1, 2))
offsets = rng.uniform(-0.25, 0.25, (T, 3, 2))
z = rng.uniform(0.2, 0.8, (T, 1, 1)) + rng.uniform(-0.05, 0.05, (T, 3, 1))
xy = centers + offsets
corners = jnp.asarray(
    np.concatenate([xy, z, np.ones((T, 3, 1))], -1).astype(np.float32)
)
valid = jnp.ones(T, bool)

W, H = 256, 128
tri = R.setup_triangles(corners, valid, W, H, R.CULL_NONE)
cuv = jnp.asarray(rng.uniform(0, 1, (T, 3, 2)).astype(np.float32))
cnrm = jnp.asarray(rng.normal(size=(T, 3, 3)).astype(np.float32))
tri_mat = jnp.asarray(rng.integers(0, 5, T).astype(np.int32))

bx, by = W // RT.TILE_W, H // RT.TILE_H
tabs = RT.pack_tables(tri, cuv, cnrm, tri_mat, by, bx)
B = bx * by
zbuf0 = jnp.full((B, 4, RT.TILE_H, RT.TILE_W), 1.0)

t0 = time.time()
f = jax.jit(lambda zb: RT.raster_pass_tpu(tabs, zb, bx=bx, depth_write=True))
zb1, gbuf = f(zbuf0)
jax.block_until_ready(gbuf)
print("pallas compile+run:", round(time.time() - t0, 1), "s")

# XLA reference
binsx = R.bin_triangles(tri, H // 64, W // 64, 64, 256)
zb_x0 = jnp.full(((H // 64) * (W // 64), 4, 64, 64), 1.0)
out = R.rasterize_pass(tri, binsx, zb_x0, tile=64, bx=W // 64, depth_write=True)


# pallas images
g = np.asarray(gbuf).reshape(by, bx, RT.N_CH, RT.TILE_H, RT.TILE_W)
g = g.transpose(2, 0, 3, 1, 4).reshape(RT.N_CH, H, W)
z_p = (
    np.asarray(zb1)
    .reshape(by, bx, 4, RT.TILE_H, RT.TILE_W)
    .transpose(2, 0, 3, 1, 4)
    .reshape(4, H, W)
)
mat_p = g[RT.CH_MAT]
cover_p = g[RT.CH_COVER]

# xla images
mat_ids = np.asarray(tri_mat)
pix = np.asarray(R.tiles_to_image(out.pix_tri, H // 64, W // 64, 64))
mat_x = np.where(pix >= 0, mat_ids[np.maximum(pix, 0)], -1).astype(np.float32)
cover_x = np.asarray(R.tiles_to_image(out.cover, H // 64, W // 64, 64))
z_x = (
    np.asarray(out.zbuf)
    .reshape(H // 64, W // 64, 4, 64, 64)
    .transpose(2, 0, 3, 1, 4)
    .reshape(4, H, W)
)

print("covered px pallas:", (mat_p >= 0).sum(), "xla:", (mat_x >= 0).sum())
match = (mat_p == mat_x).mean()
print("mat match fraction:", match)
zdiff = np.abs(z_p - z_x)
print("zbuf max diff:", zdiff.max(), "mean:", zdiff.mean())
cdiff = np.abs(cover_p - cover_x)
print("cover max diff:", cdiff.max(), "mismatched cover px:", (cdiff > 1e-6).sum())

# attr check: interpolated uv at winning pixels should match manual calc
iw = g[RT.CH_IW]
uv_u = np.where(iw > 1e-8, g[RT.CH_UIW] / np.maximum(iw, 1e-8), 0)
print("u range:", uv_u.min(), uv_u.max())

# perf micro: bigger workload
T2 = 20000
c2 = rng.uniform(-0.95, 0.95, (T2, 1, 2)) + rng.uniform(-0.03, 0.03, (T2, 3, 2))
z2 = rng.uniform(0.1, 0.9, (T2, 1, 1)) * np.ones((1, 3, 1))
corners2 = jnp.asarray(np.concatenate([c2, z2, np.ones((T2, 3, 1))], -1).astype(np.float32))
W2 = 512
H2 = 512
tri2 = R.setup_triangles(corners2, jnp.ones(T2, bool), W2, H2, R.CULL_NONE)
bx2, by2 = W2 // RT.TILE_W, H2 // RT.TILE_H
cuv2 = jnp.zeros((T2, 3, 2))
cnrm2 = jnp.zeros((T2, 3, 3))
tm2 = jnp.zeros(T2, jnp.int32)
packf = jax.jit(lambda: RT.pack_tables(tri2, cuv2, cnrm2, tm2, by2, bx2))
tabs2 = packf()
jax.block_until_ready(tabs2.ids)
print("pairs:", tabs2.ids.shape, "total binned:", int(np.asarray(tabs2.counts).sum()))
zb2 = jnp.full((bx2 * by2, 4, RT.TILE_H, RT.TILE_W), 1.0)
f2 = jax.jit(lambda zb: RT.raster_pass_tpu(tabs2, zb, bx=bx2, depth_write=True))
zb_o, g_o = f2(zb2)
jax.block_until_ready(g_o)
t0 = time.time()
n = 20
for _ in range(n):
    zb_o, g_o = f2(zb2)
jax.block_until_ready(g_o)
print(f"pallas raster 20k tris @512x512: {(time.time()-t0)/n*1000:.2f} ms")
t0 = time.time()
for _ in range(n):
    tabs3 = packf()
jax.block_until_ready(tabs3.ids)
print(f"pack_tables (setup+sort): {(time.time()-t0)/n*1000:.2f} ms")
