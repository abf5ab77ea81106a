"""Decompose the albedo/composite/bloom stage (~14 ms @1080p).

L0 shade output only     L1 + composite w/o gathers (albedo=1)
L2 + visible gather      L3 + both gathers          L4 + bloom (full)
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from reze_tpu.anim import sampler
from reze_tpu.camera import Camera
from reze_tpu.core.build import load_model
from reze_tpu.core import math3d as m3
from reze_tpu.core.types import EngineConfig
from reze_tpu.formats.vmd import load_vmd
from reze_tpu.kernels import frame_tpu as FT, shade_tpu as ST
from reze_tpu.kernels.skinning import skin_vertices
from reze_tpu.render import pipeline, pipeline_tpu as PT, raster, shading_fast as SF, post
from reze_tpu.skeleton import fk, ik as ik_mod
from scripts.profile_stages import (cfg, m, dims, lights, packed, tables, vp,
                                    eye, inv_vp, pose, build_tables)

def albedo_fn(level):
    def f(model, packed_, t):
        pos, nrm = pose(model, t)
        ft = build_tables(model, pos, nrm)
        shaded = FT.render_megakernel(
            ft, tables._replace(atlas_flat=jnp.zeros((1, 4), jnp.uint8)),
            lights, cfg.rim_light_intensity, eye, inv_vp,
            hp=dims.hp, wp=dims.wp, n_samples=cfg.msaa_samples,
            use_mips=cfg.albedo_mips, lod_bias=(1.0, 1.0))
        if level == 0:
            return shaded.sum()
        o = shaded.reshape(2 * ST.O_CH, dims.p)
        flat = model.atlas.mip_flat if cfg.albedo_mips else packed_.atlas_flat
        cr = cg = cb = jnp.zeros((dims.p,))
        for layer in range(2):
            base = layer * ST.O_CH
            half = (cfg.albedo_half_occluded and layer == 0) or (
                cfg.albedo_half_visible and layer == 1)
            gather_this = (level >= 3) or (level == 2 and layer == 1)
            if gather_this:
                albedo = PT._fetch_albedo(flat, o, base, dims,
                                          bilinear=cfg.albedo_bilinear,
                                          half_res=half)
            else:
                albedo = jnp.ones((dims.p, 3)) * o[base + ST.O_TEX, None].T[:, :3] * 1e-9 + 1.0
            rim = o[base + ST.O_RIM]
            a = o[base + ST.O_AEFF]
            na = 1.0 - a
            cr = (albedo[:, 0] * o[base + ST.O_LR] + rim) * a + cr * na
            cg = (albedo[:, 1] * o[base + ST.O_LG] + rim) * a + cg * na
            cb = (albedo[:, 2] * o[base + ST.O_LB] + rim) * a + cb * na
        img_cf = jnp.stack([cr, cg, cb]).reshape(3, dims.hp, dims.wp)
        img_cf = img_cf[:, :dims.height, :dims.width]
        if level >= 4 and cfg.enable_bloom:
            img_cf = post.apply_bloom_cf(img_cf, cfg.bloom_threshold,
                                         cfg.bloom_intensity)
        return jnp.clip(img_cf, 0.0, 1.0).sum()
    return f

N1, N2 = 2, 10
names = ["shade only", "+composite (no gather)", "+visible gather",
         "+occluded gather", "+bloom (full)"]
prev = 0.0
for level in range(5):
    f = albedo_fn(level)
    def run(seed, model, pk, n):
        def body(carry, _):
            return carry + f(model, pk, carry) * 1e-20 + 1e-3, None
        out, _ = jax.lax.scan(body, seed, None, length=n)
        return out
    times = {}
    for n in (N1, N2):
        g = jax.jit(lambda s, mo, pk, n=n: run(s, mo, pk, n))
        float(g(jnp.float32(0.5), m, packed))
        best = 1e9
        for rep in range(3):
            t0 = time.time()
            float(g(jnp.float32(rep * 1e-5), m, packed))
            best = min(best, time.time() - t0)
        times[n] = best
    ms = (times[N2] - times[N1]) / (N2 - N1) * 1000
    print(f"{names[level]:24s} cum {ms:8.2f} ms (+{ms - prev:7.2f})", flush=True)
    prev = ms
