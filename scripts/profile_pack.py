"""Sub-stage the 32 ms XLA pack cost at 1080p (see profile_stages.py).

Levels: 0 gather+setup  1 +tab/einsum  2 +pair-enum (cumsum/searchsorted)
        3 +key sort     4 +rows gather + starts/ends  (== full pack)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from reze_tpu.anim import sampler
from reze_tpu.camera import Camera
from reze_tpu.core.build import load_model
from reze_tpu.core.types import (
    CLASS_EYE, CLASS_HAIR, CLASS_OPAQUE, CLASS_TRANSPARENT, EngineConfig,
)
from reze_tpu.formats.vmd import load_vmd
from reze_tpu.kernels import frame_tpu as FT, shade_tpu as ST
from reze_tpu.kernels.skinning import skin_vertices
from reze_tpu.render import pipeline, pipeline_tpu as PT, raster
from reze_tpu.render.pipeline import _gather_pass
from reze_tpu.skeleton import fk, ik as ik_mod

MODEL = "/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx"
W, H = 1920, 1080

cfg = EngineConfig(width=W, height=H, camera_distance=13.5,
                   camera_target=(0.0, 17.1, 0.0))
built = load_model(MODEL, cfg)
m = jax.device_put(built.arrays)
cam = Camera(radius=13.5, target=(0.0, 17.1, 0.0), aspect=W / H)
dims = PT.make_dims_fast(cfg)
tables = jax.device_put(ST.pack_shade_tables(built.arrays.materials, built.arrays.atlas))
vp = cam.view_proj()

PASS_SPECS = [
    (CLASS_OPAQUE, raster.CULL_NONE, False),
    (CLASS_EYE, raster.CULL_FRONT, False),
    (CLASS_OPAQUE, raster.CULL_BACK, True),
    (CLASS_HAIR, raster.CULL_FRONT, False),
    (CLASS_HAIR, raster.CULL_BACK, True),
    (CLASS_TRANSPARENT, raster.CULL_NONE, False),
    (CLASS_TRANSPARENT, raster.CULL_BACK, True),
]

# static pose on device
rot = jnp.zeros((m.skeleton.j, 4)).at[:, 3].set(1.0)
q, p0 = fk.world_transforms(m.skeleton, rot, jnp.zeros((m.skeleton.j, 3)))
POS, NRM = skin_vertices(m.geometry, m.skinning, fk.skin_palette(m.skeleton, q, p0))
POS, NRM = jax.device_put(POS), jax.device_put(NRM)


def pack_level(tri, alpha_cols, outline, cap, level):
    import reze_tpu.kernels.frame_tpu as F
    t = tri.valid.shape[0]
    inv2a = tri.inv_area2[:, None]
    za = jnp.sum(tri.ea * tri.z, axis=1) * inv2a[:, 0]
    big = jnp.float32(1e9)
    xmin = jnp.where(tri.valid, jnp.min(tri.sx, axis=1), big)
    xmax = jnp.where(tri.valid, jnp.max(tri.sx, axis=1), -big)
    ymin = jnp.where(tri.valid, jnp.min(tri.sy, axis=1), big)
    ymax = jnp.where(tri.valid, jnp.max(tri.sy, axis=1), -big)
    if level == 0:
        return za.sum() + xmin.sum()
    tab = jnp.zeros((t, F.ROW_W)) + za[:, None]
    if level == 1:
        return tab.sum()
    bx, by = dims.wp // F.TILE_W, dims.hp // F.TILE_H
    bx0 = jnp.clip(jnp.floor((xmin - 0.5) / F.TILE_W), 0, bx - 1).astype(jnp.int32)
    bx1 = jnp.clip(jnp.floor((xmax + 0.5) / F.TILE_W), 0, bx - 1).astype(jnp.int32)
    by0 = jnp.clip(jnp.floor((ymin - 0.5) / F.TILE_H), 0, by - 1).astype(jnp.int32)
    by1 = jnp.clip(jnp.floor((ymax + 0.5) / F.TILE_H), 0, by - 1).astype(jnp.int32)
    nx = bx1 - bx0 + 1
    live = tri.valid & (xmax >= xmin)
    n_bins_tri = jnp.where(live, nx * (by1 - by0 + 1), 0)
    ends_tri = jnp.cumsum(n_bins_tri)
    starts_tri = ends_tri - n_bins_tri
    total = ends_tri[-1]
    k = jnp.arange(cap, dtype=jnp.int32)
    marks = jnp.zeros((cap,), jnp.int32).at[starts_tri].add(
        1, mode="drop", indices_are_sorted=True)
    tri_of_k = jnp.clip(jnp.cumsum(marks) - 1, 0, t - 1)
    slot = k - starts_tri[tri_of_k]
    ok = k < total
    nx_k = jnp.maximum(nx[tri_of_k], 1)
    bin_y = by0[tri_of_k] + slot // nx_k
    bin_id = bin_y * bx + (bx0[tri_of_k] + slot % nx_k)
    if level == 2:
        return bin_id.sum() + tri_of_k.sum()
    b_total = by * bx
    key = jnp.where(ok, bin_id * (1 << 15) + tri_of_k, b_total << 15)
    key = jnp.sort(key)
    if level == 3:
        return key.sum()
    pair_bin = key >> 15
    pair_tri = jnp.where(pair_bin < b_total, key & ((1 << 15) - 1), 0)
    rows = tab[pair_tri]
    counts_b = jnp.zeros((b_total,), jnp.int32).at[pair_bin].add(
        1, mode="drop", indices_are_sorted=True)
    starts = jnp.minimum(jnp.cumsum(counts_b) - counts_b, cap)
    return rows.sum() + starts.sum()


def full_fn(level):
    def f(model, pos, nrm, t):
        pos = pos + t * 1e-7
        acc = 0.0
        for cls, cull, outline in PASS_SPECS:
            data = _gather_pass(model, pos, nrm, vp, cls, outline,
                                cfg.outline_scale, None)
            tt = data.valid.shape[0]
            tri = raster.setup_triangles(data.corners_clip, data.valid,
                                         dims.wp, dims.hp, cull)
            cap = -(-int(tt * cfg.pair_cap_scale + 1024) // FT.CHUNK) * FT.CHUNK
            acc = acc + pack_level(tri, None, outline, cap, level)
        return acc
    return f


N1, N2 = 2, 10
names = ["gather+setup", "+tab(z only)", "+pair-enum", "+key sort", "+rows gather"]
prev = 0.0
for level in range(5):
    f = full_fn(level)

    def run(seed, model, pos, nrm, n):
        def body(carry, _):
            return carry + f(model, pos, nrm, carry) * 1e-20 + 1e-3, None
        out, _ = jax.lax.scan(body, seed, None, length=n)
        return out

    times = {}
    for n in (N1, N2):
        g = jax.jit(lambda s, mo, p, nr, n=n: run(s, mo, p, nr, n))
        float(g(jnp.float32(0.5), m, POS, NRM))
        best = 1e9
        for rep in range(3):
            t0 = time.time()
            float(g(jnp.float32(rep * 1e-5), m, POS, NRM))
            best = min(best, time.time() - t0)
        times[n] = best
    ms = (times[N2] - times[N1]) / (N2 - N1) * 1000
    print(f"{names[level]:14s} cum {ms:8.2f} ms (+{ms - prev:7.2f})", flush=True)
    prev = ms
