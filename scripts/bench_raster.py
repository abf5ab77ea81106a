"""Rasterizer A/B benchmark on the real chip: render_frame_mega with
rasterizer=group/mxu/stream at a given resolution, timed tbench-style
(scan-length delta, fresh seed per call).

Usage: python scripts/bench_raster.py [group stream ...] [--res 1920x1080]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from reze_tpu.anim import sampler
from reze_tpu.camera import Camera
from reze_tpu.core.build import load_model
from reze_tpu.core.types import EngineConfig
from reze_tpu.formats.vmd import load_vmd
from reze_tpu.kernels.skinning import skin_vertices
from reze_tpu.render import pipeline, pipeline_tpu as PT, shading_fast as SF
from reze_tpu.skeleton import fk, ik as ik_mod

MODEL = "/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx"
VMD = "/root/reference/web/public/animations/pool.vmd"

args = [a for a in sys.argv[1:] if not a.startswith("--")]
res = "1920x1080"
for a in sys.argv[1:]:
    if a.startswith("--res"):
        res = a.split("=")[1]
W, H = (int(x) for x in res.split("x"))
names = args or ["group", "stream"]

cfg = EngineConfig(width=W, height=H, camera_distance=13.5,
                   camera_target=(0.0, 17.1, 0.0))
built = load_model(MODEL, cfg)
m = built.arrays
track = sampler.build_animation(
    load_vmd(VMD), built.bone_name_to_id, built.morph_name_to_id,
    m.skeleton.j, m.morphs.offsets.shape[0])
rot = jnp.zeros((m.skeleton.j, 4)).at[:, 3].set(1.0)
trans = jnp.zeros((m.skeleton.j, 3))
srot, strans = sampler.sample_bones(track, jnp.float32(1.0))
rot = jnp.where(track.has_track[:, None], srot, rot)
trans = jnp.where(track.has_track[:, None], strans, trans)
if m.ik.n_chains > 0:
    rot = ik_mod.solve_ik(m.skeleton, m.ik, rot, trans)
wq, wp_ = fk.world_transforms(m.skeleton, rot, trans)
pal = fk.skin_palette(m.skeleton, wq, wp_)
pos, nrm = skin_vertices(m.geometry, m.skinning, pal)
pos = jax.device_put(pos)
nrm = jax.device_put(nrm)
m = jax.device_put(m)

cam = Camera(radius=13.5, target=(0.0, 17.1, 0.0), aspect=W / H)
dims = PT.make_dims_fast(cfg)
lights = pipeline.make_lights(cfg)
packed = SF.pack_materials(m.materials, m.atlas)
packed = jax.device_put(packed)
from reze_tpu.kernels import shade_tpu as ST
shade_tables = jax.device_put(ST.pack_shade_tables(m.materials, m.atlas))
vp, eye = cam.view_proj(), cam.position()

N1, N2 = 2, 12


def bench(r):
    c = dataclasses.replace(cfg, rasterizer=r)

    def run(seed, model, packed, pos, nrm, n):
        def body(carry, _):
            p = pos + carry * 1e-7  # fresh data per iter (cache-bust)
            img = PT.render_frame_mega(
                model, c, dims, packed, p, nrm, vp, eye, lights,
                shade_tables=shade_tables)
            return img[0, 0, 0] * 1e-6 + seed * 1e-9, None

        out, _ = jax.lax.scan(body, seed, None, length=n)
        return out

    fns = {}
    times = {}
    for n in (N1, N2):
        f = jax.jit(lambda s, mo, pk, p, nr, n=n: run(s, mo, pk, p, nr, n))
        t0 = time.time()
        float(f(jnp.float32(0.5), m, packed, pos, nrm))
        print(f"  [{r}] n={n} compile+run {time.time()-t0:.1f}s", flush=True)
        best = 1e9
        for rep in range(3):
            t0 = time.time()
            float(f(jnp.float32(rep * 1e-5), m, packed, pos, nrm))
            best = min(best, time.time() - t0)
        times[n] = best
    ms = (times[N2] - times[N1]) / (N2 - N1) * 1000
    print(f"{r}: {ms:.2f} ms/frame ({1000/ms:.1f} FPS render-only)", flush=True)
    return ms


for r in names:
    try:
        bench(r)
    except Exception as e:
        print(f"{r}: FAILED {str(e)[:300]}")
