"""Bisect the 1080p frame: config/monkeypatch toggles on the REAL pipeline."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import dataclasses

import jax
import jax.numpy as jnp

from tbench import bench_op

from reze_tpu.camera import Camera
from reze_tpu.core.build import load_model
from reze_tpu.core.types import EngineConfig, init_scene_state
from reze_tpu.kernels.skinning import skin_vertices
from reze_tpu.render import pipeline, pipeline_tpu as PT, shading_fast as SF
from reze_tpu.skeleton import fk
from reze_tpu import step as step_mod
from reze_tpu.anim import sampler

W, H = 1920, 1080
cfg = EngineConfig(width=W, height=H, camera_distance=13.5, camera_target=(0.0, 17.1, 0.0))
built = load_model("/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx", cfg)
m = built.arrays
print("ik chains:", m.ik.n_chains)
skel = m.skeleton
rot = jnp.zeros((skel.j, 4)).at[:, 3].set(1.0)
q, p = fk.world_transforms(skel, rot, jnp.zeros((skel.j, 3)))
pos, nrm = skin_vertices(m.geometry, m.skinning, fk.skin_palette(skel, q, p))
cam = Camera(radius=13.5, target=(0.0, 17.1, 0.0), aspect=W / H)
vp, eye = cam.view_proj(), cam.position()
dims = PT.make_dims_fast(cfg)
packed = SF.pack_materials(m.materials, m.atlas)
lights = pipeline.make_lights(cfg)


def frame_with(cfg2, n1=2, n2=12, tag=""):
    dims2 = PT.make_dims_fast(cfg2)

    def op(c, pos, nrm):
        f = PT.render_frame_fast(m, cfg2, dims2, packed, pos + c * 0, nrm, vp, eye, lights)
        return c + f[0, 0, 0] * 1e-9

    bench_op(f"frame {tag}", op, jnp.float32(0.0), pos, nrm, n1=n1, n2=n2)


frame_with(cfg, tag="default")
frame_with(dataclasses.replace(cfg, enable_bloom=False), tag="no bloom")

# no albedo gathers at all
orig_fetch = PT._fetch_albedo
PT._fetch_albedo = lambda *a, **k: jnp.ones((dims.p, 3))
frame_with(cfg, tag="no albedo gathers")
PT._fetch_albedo = lambda *a, **k: orig_fetch(*a, **{**k, "half_res": True})
frame_with(cfg, tag="albedo half both layers")
PT._fetch_albedo = orig_fetch

# no shade kernel (zeros)
import reze_tpu.kernels.shade_tpu as ST
orig_shade = ST.shade_stack_tpu
ST.shade_stack_tpu = lambda stack, *a, **k: jnp.zeros((2 * ST.O_CH,) + stack.shape[1:])
frame_with(cfg, tag="no shade kernel")
ST.shade_stack_tpu = orig_shade

# no push (identity)
frame_with(dataclasses.replace(cfg, msaa_samples=1), tag="msaa 1")
