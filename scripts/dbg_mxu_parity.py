"""Debug mxu-vs-group megakernel divergence on the synthetic scene (CPU)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from reze_tpu.camera import Camera
from reze_tpu.core.types import EngineConfig
from reze_tpu.render import pipeline, pipeline_tpu, shading_fast as SF
from reze_tpu.testing import make_test_model
from reze_tpu.skeleton import fk
from reze_tpu.kernels.skinning import skin_vertices

model = make_test_model()
cfg = EngineConfig(width=256, height=64, tile_size=64, max_tris_per_bin=16,
                   enable_bloom=False,
                   albedo_half_visible=False, albedo_half_occluded=False)
cam = Camera(alpha=np.pi, beta=np.pi / 2, radius=4.5, target=(0.0, 2.0, 0.0),
             aspect=2.0)
skel = model.skeleton
rot = jnp.zeros((skel.j, 4)).at[:, 3].set(1.0)
q, p = fk.world_transforms(skel, rot, jnp.zeros((skel.j, 3)))
pos, nrm = skin_vertices(model.geometry, model.skinning,
                         fk.skin_palette(skel, q, p))
lights = pipeline.make_lights(cfg)
dims = pipeline_tpu.make_dims_fast(cfg)
packed = SF.pack_materials(model.materials, model.atlas)


def render(rasterizer):
    c = dataclasses.replace(cfg, rasterizer=rasterizer)
    return np.asarray(pipeline_tpu.render_frame_mega(
        model, c, dims, packed, pos, nrm,
        cam.view_proj(), cam.position(), lights, interpret=True,
    ))


import sys as _s
r1, r2 = (_s.argv[1], _s.argv[2]) if len(_s.argv) > 2 else ("group", "mxu")
group = render(r1)
mxu = render(r2)
covered = (group.sum(-1) > 0.01) | (mxu.sum(-1) > 0.01)
diff = np.abs(group - mxu).max(-1)
print("covered:", covered.sum())
for thr in (0.005, 0.02, 0.1, 0.3):
    print(f"frac > {thr}: {(diff[covered] > thr).mean():.4f}")
bad = np.argwhere((diff > 0.02) & covered)
print("bad pixel count:", len(bad))
if len(bad):
    print("bad y range:", bad[:, 0].min(), bad[:, 0].max(),
          "x range:", bad[:, 1].min(), bad[:, 1].max())
    # bucket by tile
    from collections import Counter
    tiles = Counter((y // 8, x // 128) for y, x in bad[:, :2])
    print("tiles with bad pixels:", sorted(tiles.items())[:20])
    ys, xs = bad[0]
    print("sample bad pixel", ys, xs, "group", group[ys, xs], "mxu", mxu[ys, xs])
    # how many bad pixels are only-one-covered (silhouette) vs both
    gc = group.sum(-1) > 0.01
    mc = mxu.sum(-1) > 0.01
    both = gc & mc
    print("bad & both-covered:", ((diff > 0.02) & both).sum(),
          "bad & one-sided:", ((diff > 0.02) & covered & ~both).sum())
