"""Measure megakernel-vs-XLA divergence on the real chip, multiple configs.

For re-baselining tests/test_tpu_hw.py (VERDICT r2 item 3): reports, for
bind pose AND an animated frame (t=1 s), the fraction of covered pixels
differing >0.02 at full resolution and after 4x4 box downsampling (the
mip-comparable comparison that removes rasterization-order minification
aliasing).

Usage: python scripts/hw_parity_probe.py  (on the TPU backend)
"""
import os
import sys

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

cfg = EngineConfig(width=512, height=512, camera_distance=13.5,
                   camera_target=(0.0, 17.1, 0.0), enable_bloom=False,
                   max_tris_per_bin=8192, albedo_bilinear=True,
                   albedo_half_visible=False, albedo_half_occluded=False,
                   albedo_mips=False)
built = load_model(MODEL, cfg)
m = built.arrays
track = sampler.build_animation(
    load_vmd(VMD), built.bone_name_to_id, built.morph_name_to_id,
    m.skeleton.j, m.morphs.offsets.shape[0])
cam = Camera(radius=13.5, target=(0.0, 17.1, 0.0), aspect=1.0)
lights = pipeline.make_lights(cfg)
packed = SF.pack_materials(m.materials, m.atlas)


def pose(t):
    skel = m.skeleton
    rot = jnp.zeros((skel.j, 4)).at[:, 3].set(1.0)
    trans = jnp.zeros((skel.j, 3))
    if t > 0:
        srot, strans = sampler.sample_bones(track, jnp.float32(t))
        rot = jnp.where(track.has_track[:, None], srot, rot)
        trans = jnp.where(track.has_track[:, None], strans, trans)
    if m.ik.n_chains > 0:
        rot = ik_mod.solve_ik(skel, m.ik, rot, trans)
    q, p = fk.world_transforms(skel, rot, trans)
    return skin_vertices(m.geometry, m.skinning, fk.skin_palette(skel, q, p))


def down4(a):
    h, w = a.shape
    return a.reshape(h // 4, 4, w // 4, 4).mean((1, 3))


def stats(img_x, img_f, tag):
    lx, lf = img_x.mean(-1), img_f.mean(-1)
    for name, ax, af in (("full", lx, lf), ("down4", down4(lx), down4(lf))):
        covered = (ax > 0.01) | (af > 0.01)
        d = np.abs(ax - af)
        frac = (d > 0.02)[covered].mean()
        mean = d[covered].mean()
        print(f"{tag:28s} {name:6s} frac>{0.02}: {frac:.4f}  mean: {mean:.4f}",
              flush=True)


for t in (0.0, 1.0):
    pos, nrm = pose(t)
    img_x = np.asarray(jax.jit(lambda pos, nrm: pipeline.render_frame(
        m, cfg, pipeline.make_dims(cfg), pos, nrm, cam.view_proj(),
        cam.position(), lights))(pos, nrm))
    for rname, rcfg in (
        ("parity(bilinear,no-mips)", cfg),
        ("default(mips,half-res)", dataclasses.replace(
            cfg, albedo_bilinear=False, albedo_half_visible=True,
            albedo_half_occluded=True, albedo_mips=True)),
    ):
        img_f = np.asarray(jax.jit(lambda pos, nrm, c=rcfg: PT.render_frame_mega(
            m, c, PT.make_dims_fast(c), packed, pos, nrm, cam.view_proj(),
            cam.position(), lights))(pos, nrm))
        assert np.isfinite(img_f).all()
        stats(img_x, img_f, f"t={t} {rname}")
    np.savez(f"/tmp/hw_parity_t{t}.npz", x=img_x, f=img_f)
