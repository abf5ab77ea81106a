"""Dev: compare the Pallas fast pipeline against the XLA reference pipeline
on the real model, and save both frames."""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from PIL import Image

from reze_tpu.camera import Camera
from reze_tpu.core.build import load_model
from reze_tpu.core.types import EngineConfig
from reze_tpu.kernels.skinning import skin_vertices
from reze_tpu.render import pipeline, pipeline_tpu, shading_fast as SF
from reze_tpu.skeleton import fk

SIZE = 256
cfg = EngineConfig(
    width=SIZE, height=SIZE, ambient=1.0, bloom_intensity=0.13,
    rim_light_intensity=0.35, camera_distance=13.5,
    camera_target=(0.0, 17.1, 0.0), max_tris_per_bin=4096,
)
built = load_model("/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx", cfg)
m = built.arrays
skel = m.skeleton
rot = jnp.zeros((skel.j, 4)).at[:, 3].set(1.0)
q, p = fk.world_transforms(skel, rot, jnp.zeros((skel.j, 3)))
pos, nrm = skin_vertices(m.geometry, m.skinning, fk.skin_palette(skel, q, p))
cam = Camera(radius=13.5, target=(0.0, 17.1, 0.0), aspect=1.0)
lights = pipeline.make_lights(cfg)
vp, eye = cam.view_proj(), cam.position()

# fast path
fdims = pipeline_tpu.make_dims_fast(cfg)
packed = SF.pack_materials(m.materials, m.atlas)
fast = jax.jit(
    lambda pos, nrm: pipeline_tpu.render_frame_fast(
        m, cfg, fdims, packed, pos, nrm, vp, eye, lights
    )
)
t0 = time.time()
img_f = np.asarray(fast(pos, nrm))
print(f"fast compile+run: {time.time()-t0:.1f}s")
t0 = time.time()
N = 10
for _ in range(N):
    out = fast(pos, nrm)
jax.block_until_ready(out)
print(f"fast pipeline: {(time.time()-t0)/N*1000:.1f} ms/frame @{SIZE}")

# reference path
dims = pipeline.make_dims(cfg)
ref = jax.jit(
    lambda pos, nrm: pipeline.render_frame(m, cfg, dims, pos, nrm, vp, eye, lights)
)
t0 = time.time()
img_r = np.asarray(ref(pos, nrm))
print(f"ref compile+run: {time.time()-t0:.1f}s")

Image.fromarray((np.clip(img_f, 0, 1) * 255).astype(np.uint8)).save("/tmp/fast.png")
Image.fromarray((np.clip(img_r, 0, 1) * 255).astype(np.uint8)).save("/tmp/ref.png")
diff = np.abs(img_f - img_r)
print("mean abs diff:", diff.mean(), "max:", diff.max(), "frac>0.05:", (diff.max(-1) > 0.05).mean())
