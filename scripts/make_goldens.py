"""Generate committed golden artifacts (VERDICT r1 item 4).

- 512x512 XLA-path frames of 塞尔凯特2: bind pose + pool.vmd @ t=1s
- per-vertex skinned positions at 5 animation timestamps (FK+IK+skin,
  physics off — the solver is tolerance-matched, not bitwise)

Run on the CPU backend for reproducibility: JAX_PLATFORMS=cpu python
scripts/make_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from reze_tpu.anim import sampler
from reze_tpu.camera import Camera
from reze_tpu.core.build import load_model
from reze_tpu.core.types import EngineConfig
from reze_tpu.formats.vmd import load_vmd
from reze_tpu.kernels.skinning import skin_vertices
from reze_tpu.render import pipeline
from reze_tpu.skeleton import fk, ik as ik_mod

MODEL = "/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx"
VMD = "/root/reference/web/public/animations/pool.vmd"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden")
TIMES = [0.0, 0.5, 1.0, 2.0, 4.0]

cfg = EngineConfig(width=512, height=512, camera_distance=13.5,
                   camera_target=(0.0, 17.1, 0.0), max_tris_per_bin=8192)
built = load_model(MODEL, cfg)
m = built.arrays
skel = m.skeleton
motion = load_vmd(VMD)
track = sampler.build_animation(
    motion, built.bone_name_to_id, built.morph_name_to_id,
    skel.j, m.morphs.offsets.shape[0],
)
cam = Camera(radius=13.5, target=(0.0, 17.1, 0.0), aspect=1.0)
dims = pipeline.make_dims(cfg)
lights = pipeline.make_lights(cfg)


def pose_at(t: float):
    rot = jnp.zeros((skel.j, 4)).at[:, 3].set(1.0)
    trans = jnp.zeros((skel.j, 3))
    if t > 0:
        srot, strans = sampler.sample_bones(track, jnp.float32(t))
        rot = jnp.where(track.has_track[:, None], srot, rot)
        trans = jnp.where(track.has_track[:, None], strans, trans)
    mw = sampler.sample_morphs(track, jnp.float32(t)) if t > 0 else jnp.zeros(
        m.morphs.offsets.shape[0])
    if m.ik.n_chains > 0:
        rot = ik_mod.solve_ik(skel, m.ik, rot, trans)
    wq, wp = fk.world_transforms(skel, rot, trans)
    pal = fk.skin_palette(skel, wq, wp)
    pos, nrm = skin_vertices(m.geometry, m.skinning, pal,
                             morphs=m.morphs, morph_weights=mw,
                             world_quat_palette=wq)
    return pos, nrm


# per-vertex goldens
verts = {}
for t in TIMES:
    pos, _ = pose_at(t)
    verts[f"t{t}"] = np.asarray(pos[: m.geometry.n_vertices])
np.savez_compressed(os.path.join(OUT, "serket2_vertices.npz"), **verts)
print("vertex goldens written")

# frame goldens (XLA reference path)
for name, t in [("bind", 0.0), ("t1", 1.0)]:
    pos, nrm = pose_at(t)
    img = np.asarray(pipeline.render_frame(
        m, cfg, dims, pos, nrm, cam.view_proj(), cam.position(), lights))
    np.savez_compressed(os.path.join(OUT, f"serket2_512_{name}.npz"),
                        img=img.astype(np.float16))
    print(f"frame golden {name}: mean {img.mean():.4f}")
print("done")
