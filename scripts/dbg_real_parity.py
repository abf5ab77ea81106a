"""stream/mxu vs group megakernel divergence on the REAL model (CPU)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import numpy as np

from reze_tpu.anim import sampler
from reze_tpu.camera import Camera
from reze_tpu.core.build import load_model
from reze_tpu.core.types import EngineConfig
from reze_tpu.formats.vmd import load_vmd
from reze_tpu.kernels.skinning import skin_vertices
from reze_tpu.render import pipeline, pipeline_tpu as PT, shading_fast as SF
from reze_tpu.skeleton import fk, ik as ik_mod
import jax.numpy as jnp

MODEL = "/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx"
VMD = "/root/reference/web/public/animations/pool.vmd"

cfg = EngineConfig(width=256, height=256, camera_distance=13.5,
                   camera_target=(0.0, 17.1, 0.0), enable_bloom=False,
                   albedo_bilinear=True, albedo_half_occluded=False,
                   albedo_half_visible=False)
built = load_model(MODEL, cfg)
m = built.arrays
track = sampler.build_animation(
    load_vmd(VMD), built.bone_name_to_id, built.morph_name_to_id,
    m.skeleton.j, m.morphs.offsets.shape[0])
t = 1.0
rot = jnp.zeros((m.skeleton.j, 4)).at[:, 3].set(1.0)
trans = jnp.zeros((m.skeleton.j, 3))
srot, strans = sampler.sample_bones(track, jnp.float32(t))
rot = jnp.where(track.has_track[:, None], srot, rot)
trans = jnp.where(track.has_track[:, None], strans, trans)
mw = sampler.sample_morphs(track, jnp.float32(t))
if m.ik.n_chains > 0:
    rot = ik_mod.solve_ik(m.skeleton, m.ik, rot, trans)
wq, wp = fk.world_transforms(m.skeleton, rot, trans)
pal = fk.skin_palette(m.skeleton, wq, wp)
pos, nrm = skin_vertices(m.geometry, m.skinning, pal, morphs=m.morphs,
                         morph_weights=mw, world_quat_palette=wq)

cam = Camera(radius=13.5, target=(0.0, 17.1, 0.0), aspect=1.0)
dims = PT.make_dims_fast(cfg)
lights = pipeline.make_lights(cfg)
packed = SF.pack_materials(m.materials, m.atlas)


def render(r):
    c = dataclasses.replace(cfg, rasterizer=r)
    return np.asarray(PT.render_frame_mega(
        m, c, dims, packed, pos, nrm, cam.view_proj(), cam.position(),
        lights, interpret=True))


names = sys.argv[1:] or ["group", "stream"]
imgs = {n: render(n) for n in names}
a, b = imgs[names[0]], imgs[names[1]]
covered = (a.sum(-1) > 0.01) | (b.sum(-1) > 0.01)
d = np.abs(a - b).max(-1)
print(f"covered: {covered.sum()}")
for thr in (0.02, 0.1, 0.3):
    print(f"frac > {thr}: {(d[covered] > thr).mean():.4f}")
lum_a, lum_b = a.mean(-1), b.mean(-1)
print(f"mean lum diff: {np.abs(lum_a - lum_b)[covered].mean():.4f}")
np.savez("/tmp/real_parity.npz", **imgs)
