"""Megakernel on the real chip: parity vs per-pass path + timing at 1080p."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from tbench import bench_op

from reze_tpu.camera import Camera
from reze_tpu.core.build import load_model
from reze_tpu.core.types import EngineConfig
from reze_tpu.kernels.skinning import skin_vertices
from reze_tpu.render import pipeline, pipeline_tpu as PT, shading_fast as SF
from reze_tpu.skeleton import fk

W = int(os.environ.get("W", 1920))
H = int(os.environ.get("H", 1080))
cfg = EngineConfig(width=W, height=H, camera_distance=13.5, camera_target=(0.0, 17.1, 0.0),
                   rasterizer=os.environ.get("RZ_RASTER", "group"))
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

img_mega = np.asarray(jax.jit(
    lambda pos, nrm: PT.render_frame_mega(m, cfg, dims, packed, pos, nrm, vp, eye, lights)
)(pos, nrm))
print("mega frame mean", img_mega.mean(), "finite", np.isfinite(img_mega).all())
img_fast = np.asarray(jax.jit(
    lambda pos, nrm: PT.render_frame_fast(m, cfg, dims, packed, pos, nrm, vp, eye, lights)
)(pos, nrm))
diff = np.abs(img_mega - img_fast).max(-1)
print(f"mega vs per-pass: max {diff.max():.4f}, frac>0.05 {(diff > 0.05).mean():.5f}")

from PIL import Image
Image.fromarray((np.clip(img_mega, 0, 1) * 255).astype(np.uint8)).save("/tmp/mega_frame.png")


def frame_op(c, pos, nrm):
    f = PT.render_frame_mega(m, cfg, dims, packed, pos + c * 0, nrm, vp, eye, lights)
    return c + f[0, 0, 0] * 1e-9


bench_op("FULL mega frame", frame_op, jnp.float32(0.0), pos, nrm, n1=2, n2=22)
