"""Dev script: render a frame of 塞尔凯特2 and save a PNG.

Usage: python scripts/render_debug.py [--cpu] [--size 512] [--out /tmp/frame.png]
"""

import argparse
import sys
import time

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--size", type=int, default=512)
parser.add_argument("--width", type=int, default=0)
parser.add_argument("--out", default="/tmp/frame.png")
parser.add_argument("--pose", default="bind", choices=["bind", "anim"])
parser.add_argument("--t", type=float, default=0.8)
parser.add_argument("--bench", type=int, default=0)
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from reze_tpu.core.build import load_model
from reze_tpu.core.types import EngineConfig
from reze_tpu.skeleton import fk
from reze_tpu.kernels.skinning import skin_vertices
from reze_tpu.render import pipeline
from reze_tpu.camera import Camera

W = args.width or args.size
H = args.size
cfg = EngineConfig(
    width=W, height=H, ambient=1.0, bloom_intensity=0.13,
    rim_light_intensity=0.35, camera_distance=13.5,
    camera_target=(0.0, 17.1, 0.0), max_tris_per_bin=4096,
)
built = load_model("/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx", cfg)
m = built.arrays
skel = m.skeleton

rot = jnp.zeros((skel.j, 4)).at[:, 3].set(1.0)
trans = jnp.zeros((skel.j, 3))
if args.pose == "anim":
    from reze_tpu.anim import sampler
    from reze_tpu.formats.vmd import load_vmd

    motion = load_vmd("/root/reference/web/public/animations/pool.vmd")
    track = sampler.build_animation(
        motion, built.bone_name_to_id, built.morph_name_to_id, skel.j, m.morphs.offsets.shape[0]
    )
    track = jax.device_put(track)
    srot, strans = sampler.sample_bones(track, jnp.float32(args.t))
    rot = jnp.where(track.has_track[:, None], srot, rot)
    trans = jnp.where(track.has_track[:, None], strans, trans)

q, p = fk.world_transforms(skel, rot, trans)
palette = fk.skin_palette(skel, q, p)
pos, nrm = skin_vertices(m.geometry, m.skinning, palette)

cam = Camera(alpha=np.pi, beta=np.pi / 2.5, radius=13.5, target=(0.0, 17.1, 0.0), aspect=W / H)
lights = pipeline.make_lights(cfg)
dims = pipeline.make_dims(cfg)

frame_fn = jax.jit(
    lambda pos, nrm: pipeline.render_frame(m, cfg, dims, pos, nrm, cam.view_proj(), cam.position(), lights)
)
t0 = time.time()
img = np.asarray(frame_fn(pos, nrm))
print(f"compile+run: {time.time()-t0:.1f}s  covered px: {(img.sum(-1) > 0.01).sum()}")

if args.bench:
    t0 = time.time()
    for _ in range(args.bench):
        out = frame_fn(pos, nrm)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / args.bench
    print(f"steady-state: {dt*1000:.1f} ms/frame = {1/dt:.1f} FPS")

from PIL import Image

Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(args.out)
print("saved", args.out)
