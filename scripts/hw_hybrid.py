"""On-chip validation + timing of the hybrid MXU megakernel vs the group
kernel (round 5). Smallest compiles first: a small-res parity render (does
Mosaic lower the in-kernel transpose / hi-lo matmuls / bitcasts at all, and
does the precision scheme hold on real hardware?), then megakernel-only
timings at the target res.

Usage: python scripts/hw_hybrid.py [--res=1920x1080] [--parity] [--time]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tbench import bench_op

from reze_tpu.anim import sampler
from reze_tpu.camera import Camera
from reze_tpu.core.build import load_model
from reze_tpu.core.types import EngineConfig
from reze_tpu.formats.vmd import load_vmd
from reze_tpu.kernels import frame_hybrid as FH, frame_tpu as FT, shade_tpu as ST
from reze_tpu.kernels.skinning import skin_vertices
from reze_tpu.render import pipeline, pipeline_tpu as PT, shading_fast as SF
from reze_tpu.skeleton import fk
from reze_tpu.core import math3d as m3

res = "1920x1080"
do_parity = False
do_time = False
for a in sys.argv[1:]:
    if a.startswith("--res="):
        res = a.split("=")[1]
    elif a == "--parity":
        do_parity = True
    elif a == "--time":
        do_time = True
W, H = (int(x) for x in res.split("x"))

MODEL = "/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx"
VMD = "/root/reference/web/public/animations/pool.vmd"

cfg = EngineConfig(width=W, height=H, camera_distance=13.5,
                   camera_target=(0.0, 17.1, 0.0))
built = load_model(MODEL, cfg)
m = built.arrays
skel = m.skeleton

track = jax.device_put(sampler.build_animation(
    load_vmd(VMD), built.bone_name_to_id, built.morph_name_to_id,
    skel.j, m.morphs.offsets.shape[0]))
rot = jnp.zeros((skel.j, 4)).at[:, 3].set(1.0)
srot, strans = sampler.sample_bones(track, jnp.float32(1.0))
rot = jnp.where(track.has_track[:, None], srot, rot)
trans = jnp.where(track.has_track[:, None], strans, jnp.zeros((skel.j, 3)))
q, p = fk.world_transforms(skel, rot, trans)
pos, nrm = skin_vertices(m.geometry, m.skinning, fk.skin_palette(skel, q, p))
cam = Camera(radius=13.5, target=(0.0, 17.1, 0.0), aspect=W / H)
vp, eye = cam.view_proj(), cam.position()
dims = PT.make_dims_fast(cfg)
lights = pipeline.make_lights(cfg)
tables_sh = ST.pack_shade_tables(m.materials, m.atlas)
packed = SF.pack_materials(m.materials, m.atlas)
inv_vp = m3.mat4_inverse(vp)

if do_parity:
    def render(r, mode):
        c = dataclasses.replace(cfg, rasterizer=r, msaa_mode=mode)
        return np.asarray(PT.render_frame_mega(
            m, c, dims, packed, pos, nrm, vp, eye, lights))

    for mode in ("analytic", "msaa"):
        g = render("group", mode)
        h = render("hybrid", mode)
        covered = (g.sum(-1) > 0.01) | (h.sum(-1) > 0.01)
        diff = np.abs(g - h).max(-1)
        bad = (diff[covered] > 0.02).mean() if covered.any() else 1.0
        print(f"parity {mode}: covered={int(covered.sum())} "
              f"mean|d|={diff[covered].mean():.5f} frac>0.02={bad:.4f} "
              f"max={diff[covered].max():.4f}", flush=True)

if do_time:
    ft = jax.jit(lambda pos, nrm: PT._build_group_tables(
        m, cfg, dims, tables_sh, pos, nrm, vp, None))(pos, nrm)
    ft = jax.device_put(jax.tree.map(np.asarray, ft))
    counts = np.asarray(ft.counts)
    nz = counts > 0
    print(f"pairs={counts.sum()} segs={nz.sum()} "
          f"chunks={(-(-counts[nz] // 128)).sum()}", flush=True)
    use_mips, lod_bias = PT._mip_args(cfg, m)

    def run_variant(name, fn, n_samples, analytic):
        def op(c, rows):
            t2 = ft._replace(rows=rows + c * 0)
            out = fn(
                t2, tables_sh, lights, cfg.rim_light_intensity, eye, inv_vp,
                hp=dims.hp, wp=dims.wp, n_samples=n_samples,
                use_mips=use_mips, lod_bias=lod_bias, analytic=analytic)
            return c + out[0, 0, 0] * 1e-9

        return bench_op(name, op, jnp.float32(0.0), ft.rows, n1=2, n2=22)

    run_variant("group analytic", FT.render_megakernel, 1, True)
    run_variant("hybrid analytic", FH.render_megakernel_hybrid, 1, True)
    run_variant("group msaa4", FT.render_megakernel, 4, False)
    run_variant("hybrid msaa4", FH.render_megakernel_hybrid, 4, False)
