"""Batched crowd rendering (BASELINE config #5, scaled to the hardware at
hand): B characters of 塞尔凯特2 with staggered clip offsets of pool.vmd and
per-character cameras, stepped as ONE vmapped jit — the whole crowd is a
single device program. On a multi-chip mesh the same code shards the batch
over 'data' (see reze_tpu/distrib.py and __graft_entry__.dryrun_multichip).

Usage: python examples/crowd.py [--batch 4] [--size 256] [--frames 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--batch", type=int, default=4)
parser.add_argument("--size", type=int, default=256)
parser.add_argument("--frames", type=int, default=30)
parser.add_argument("--chunk", type=int, default=0,
                    help="characters per megakernel launch (0 = all at once;"
                         " use ~32 for 256-char crowds)")
parser.add_argument("--out", default="/tmp/crowd")
args = parser.parse_args()

import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # the sandbox preregisters the TPU plugin; honor the env override
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import reze_tpu  # noqa: E402,F401
from reze_tpu import distrib  # noqa: E402
from reze_tpu.anim import sampler  # noqa: E402
from reze_tpu.camera import Camera  # noqa: E402
from reze_tpu.core.build import load_model  # noqa: E402
from reze_tpu.core.types import EngineConfig  # noqa: E402
from reze_tpu.formats.vmd import load_vmd  # noqa: E402
from reze_tpu.render import pipeline, pipeline_tpu  # noqa: E402

B = args.batch
cfg = EngineConfig(width=args.size, height=args.size, camera_distance=13.5,
                   camera_target=(0.0, 17.1, 0.0))
built = load_model("/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx", cfg)
model = built.arrays
motion = load_vmd("/root/reference/web/public/animations/pool.vmd")
track = jax.device_put(
    sampler.build_animation(
        motion, built.bone_name_to_id, built.morph_name_to_id,
        model.skeleton.j, model.morphs.offsets.shape[0],
    )
)
j = model.skeleton.j
breath = {
    "mask": jnp.zeros(j, bool), "ranges": jnp.zeros(j),
    "base": jnp.zeros((j, 4)).at[:, 3].set(1.0),
    "half_cycle": jnp.float32(2.5), "start": jnp.float32(track.duration + 0.2),
}

mesh = distrib.make_mesh(1)  # single chip; batch stays local
dims = (
    pipeline_tpu.make_dims_fast(cfg)
    if jax.default_backend() != "cpu"
    else pipeline.make_dims(cfg)
)
lights = pipeline.make_lights(cfg)
step = distrib.make_batched_step(model, cfg, None, mesh,
                                 crowd_chunk=args.chunk or None)

states = distrib.batch_state(model, B)
# stagger clip start times so every character dances out of phase
states = states.replace(
    playing=jnp.ones(B, bool),
    play_t0=-jnp.arange(B, dtype=jnp.float32) * 0.35,
)
cams = [
    Camera(alpha=np.pi + 0.25 * (i - B / 2), radius=13.5,
           target=(0.0, 17.1, 0.0), aspect=1.0)
    for i in range(B)
]
vps = jnp.stack([c.view_proj() for c in cams])
eyes = jnp.stack([c.position() for c in cams])

t0 = time.time()
states, frames = step(states, jnp.float32(1 / 30), vps, eyes, lights, track, breath)
jax.block_until_ready(frames)
print(f"compile+first crowd step: {time.time()-t0:.1f}s  frames {frames.shape}")

t0 = time.time()
for _ in range(args.frames):
    states, frames = step(states, jnp.float32(1 / 30), vps, eyes, lights, track, breath)
jax.block_until_ready(frames)
dt = (time.time() - t0) / args.frames
print(f"crowd step: {dt*1000:.1f} ms for {B} characters "
      f"= {B/dt:.1f} char-frames/sec")

os.makedirs(args.out, exist_ok=True)
from PIL import Image  # noqa: E402

f = np.asarray(jnp.clip(frames, 0, 1) * 255).astype(np.uint8)
rows = [np.concatenate(list(f[i : i + 2]), axis=1) for i in range(0, B, 2)]
montage = np.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
Image.fromarray(montage).save(f"{args.out}/crowd.png")
print(f"wrote {args.out}/crowd.png")
