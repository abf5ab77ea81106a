"""Decompose the megakernel frame into stage costs on the real chip.

Times cumulative prefixes of the group-path pipeline with the tbench
methodology (scan-length delta, cache-busting seed), so stage cost =
difference of consecutive prefixes:

  P0 pose+skin (FK+IK+physics excluded — raster focus)
  P1 + pass gather + tri setup + pack rows (XLA)
  P2 + megakernel (raster + in-kernel compose + in-kernel shade)
  P3 + albedo fetch + composite + bloom (XLA)  == full render

Usage: python scripts/profile_stages.py [--res=1920x1080] [--r=group]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
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
from reze_tpu.render import pipeline, pipeline_tpu as PT, raster, shading_fast as SF
from reze_tpu.render.pipeline import _gather_pass
from reze_tpu.skeleton import fk, ik as ik_mod
from reze_tpu.core import math3d as m3

MODEL = "/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx"
VMD = "/root/reference/web/public/animations/pool.vmd"

res = "1920x1080"
rast = "group"
for a in sys.argv[1:]:
    if a.startswith("--res="):
        res = a.split("=")[1]
    if a.startswith("--r="):
        rast = a.split("=")[1]
W, H = (int(x) for x in res.split("x"))

cfg = EngineConfig(width=W, height=H, camera_distance=13.5,
                   camera_target=(0.0, 17.1, 0.0), rasterizer=rast)
built = load_model(MODEL, cfg)
m = jax.device_put(built.arrays)
track = sampler.build_animation(
    load_vmd(VMD), built.bone_name_to_id, built.morph_name_to_id,
    built.arrays.skeleton.j, built.arrays.morphs.offsets.shape[0])
track = jax.device_put(track)
cam = Camera(radius=13.5, target=(0.0, 17.1, 0.0), aspect=W / H)
dims = PT.make_dims_fast(cfg)
lights = pipeline.make_lights(cfg)
packed = jax.device_put(SF.pack_materials(built.arrays.materials, built.arrays.atlas))
tables = jax.device_put(ST.pack_shade_tables(built.arrays.materials, built.arrays.atlas))
vp, eye = cam.view_proj(), cam.position()
inv_vp = m3.mat4_inverse(vp)

PASS_SPECS = [
    (CLASS_OPAQUE, raster.CULL_NONE, False),
    (CLASS_EYE, raster.CULL_FRONT, False),
    (CLASS_OPAQUE, raster.CULL_BACK, True),
    (CLASS_HAIR, raster.CULL_FRONT, False),
    (CLASS_HAIR, raster.CULL_BACK, True),
    (CLASS_TRANSPARENT, raster.CULL_NONE, False),
    (CLASS_TRANSPARENT, raster.CULL_BACK, True),
]


def pose(model, t):
    rot = jnp.zeros((model.skeleton.j, 4)).at[:, 3].set(1.0)
    trans = jnp.zeros((model.skeleton.j, 3))
    srot, strans = sampler.sample_bones(track, t)
    rot = jnp.where(track.has_track[:, None], srot, rot)
    trans = jnp.where(track.has_track[:, None], strans, trans)
    if model.ik.n_chains > 0:
        rot = ik_mod.solve_ik(model.skeleton, model.ik, rot, trans)
    wq, wp_ = fk.world_transforms(model.skeleton, rot, trans)
    pal = fk.skin_palette(model.skeleton, wq, wp_)
    return skin_vertices(model.geometry, model.skinning, pal)


def build_tables(model, pos, nrm):
    """Production pack: merged single-sort FrameTables (pipeline_tpu)."""
    return PT._build_group_tables(model, cfg, dims, tables, pos, nrm, vp,
                                  None)


def stage_fn(level):
    def f(model, packed, t):
        pos, nrm = pose(model, t)
        if level == 0:
            return pos.sum()
        ft = build_tables(model, pos, nrm)
        if level == 1:
            return ft.rows.sum() + ft.starts.sum()
        shaded = FT.render_megakernel(
            ft, tables._replace(atlas_flat=jnp.zeros((1, 4), jnp.uint8)),
            lights, cfg.rim_light_intensity, eye, inv_vp,
            hp=dims.hp, wp=dims.wp, n_samples=cfg.msaa_samples,
            use_mips=cfg.albedo_mips, lod_bias=(1.0, 1.0),
        )
        if level == 2:
            return shaded.sum()
        o = shaded.reshape(2 * ST.O_CH, dims.p)
        flat = (model.atlas.mip_flat if cfg.albedo_mips
                else packed.atlas_flat)
        img = PT._finish_frame(o, flat, dims, cfg)
        return img.sum()
    return f


if __name__ == "__main__":
    N1, N2 = 2, 10
    names = ["pose+skin", "+pack(XLA)", "+megakernel", "+albedo/bloom"]
    prev = 0.0
    for level in range(4):
        f = stage_fn(level)
    
        def run(seed, model, packed, n):
            def body(carry, _):
                out = f(model, packed, carry)
                return carry + out * 1e-20 + 1e-3, None
            out, _ = jax.lax.scan(body, seed, None, length=n)
            return out
    
        times = {}
        for n in (N1, N2):
            g = jax.jit(lambda s, mo, pk, n=n: run(s, mo, pk, n))
            t0 = time.time()
            float(g(jnp.float32(0.5), m, packed))
            compile_s = time.time() - t0
            best = 1e9
            for rep in range(3):
                t0 = time.time()
                float(g(jnp.float32(rep * 1e-5), m, packed))
                best = min(best, time.time() - t0)
            times[n] = best
        ms = (times[N2] - times[N1]) / (N2 - N1) * 1000
        print(f"{names[level]:16s} cum {ms:8.2f} ms  (+{ms - prev:7.2f} ms)  "
              f"[compile {compile_s:.0f}s]", flush=True)
        prev = ms
