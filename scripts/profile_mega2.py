"""Megakernel cost attribution: depth-only / no-gate / msaa1 variants."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tbench import bench_op

from reze_tpu.camera import Camera
from reze_tpu.core.build import load_model
from reze_tpu.core.types import EngineConfig
from reze_tpu.kernels import frame_tpu as FT
from reze_tpu.kernels.skinning import skin_vertices
from reze_tpu.render import pipeline, pipeline_tpu as PT, shading_fast as SF
from reze_tpu.skeleton import fk

W, H = 1920, 1080
cfg = EngineConfig(width=W, height=H, camera_distance=13.5, camera_target=(0.0, 17.1, 0.0))
built = load_model("/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx", cfg)
m = built.arrays
skel = m.skeleton
rot = jnp.zeros((skel.j, 4)).at[:, 3].set(1.0)
q, p = fk.world_transforms(skel, rot, jnp.zeros((skel.j, 3)))
pos, nrm = skin_vertices(m.geometry, m.skinning, fk.skin_palette(skel, q, p))
cam = Camera(radius=13.5, target=(0.0, 17.1, 0.0), aspect=W / H)
vp, eye = cam.view_proj(), cam.position()
dims = PT.make_dims_fast(cfg)
packed = SF.pack_materials(m.materials, m.atlas)
lights = pipeline.make_lights(cfg)

variant = sys.argv[1] if len(sys.argv) > 1 else "full"
cfg2 = cfg
if variant == "depth_only":
    FT.DEBUG_DEPTH_ONLY = True
elif variant == "no_gate":
    FT.DEBUG_NO_WINNER_GATE = True
elif variant == "msaa1":
    cfg2 = dataclasses.replace(cfg, msaa_samples=1)
elif variant == "noalbedo":
    PT._fetch_albedo = lambda *a, **k: jnp.ones((dims.p, 3))
print("variant:", variant)


def frame_op(c, pos, nrm):
    f = PT.render_frame_mega(m, cfg2, dims, packed, pos + c * 0, nrm, vp, eye, lights)
    return c + f[0, 0, 0] * 1e-9


bench_op(f"mega frame [{variant}]", frame_op, jnp.float32(0.0), pos, nrm, n1=2, n2=22)
