"""Dev: stage-wise timing of the fast pipeline on the real model."""

import time

import jax
import jax.numpy as jnp
import numpy as np

import reze_tpu  # noqa: F401 (compile cache)
from reze_tpu.camera import Camera
from reze_tpu.core.build import load_model
from reze_tpu.core.types import (
    CLASS_EYE, CLASS_HAIR, CLASS_OPAQUE, CLASS_TRANSPARENT, EngineConfig,
    init_scene_state,
)
from reze_tpu.kernels import raster_tpu as RT
from reze_tpu.kernels.skinning import skin_vertices
from reze_tpu.physics import solver
from reze_tpu.render import pipeline, pipeline_tpu, raster as R, shading_fast as SF
from reze_tpu.render.pipeline import _gather_pass
from reze_tpu.skeleton import fk

import sys

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
W = H = SIZE
cfg = EngineConfig(width=W, height=H, camera_distance=13.5, camera_target=(0.0, 17.1, 0.0))
built = load_model("/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx", cfg)
m = built.arrays
skel = m.skeleton
rot = jnp.zeros((skel.j, 4)).at[:, 3].set(1.0)
q, p = fk.world_transforms(skel, rot, jnp.zeros((skel.j, 3)))
pos, nrm = skin_vertices(m.geometry, m.skinning, fk.skin_palette(skel, q, p))
cam = Camera(radius=13.5, target=(0.0, 17.1, 0.0), aspect=W / H)
vp, eye = cam.view_proj(), cam.position()
dims = pipeline_tpu.make_dims_fast(cfg)
packed = SF.pack_materials(m.materials, m.atlas)
lights = pipeline.make_lights(cfg)


def t(name, f, *a, n=20):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)
    return out


# pack per class
for cls, name in [(CLASS_OPAQUE, "opaque"), (CLASS_EYE, "eye"), (CLASS_HAIR, "hair"), (CLASS_TRANSPARENT, "transp")]:
    data = _gather_pass(m, pos, nrm, vp, cls, False, cfg.outline_scale)
    tcount = min(data.valid.shape[0], RT.MAX_TRIS_PER_CALL)
    tri = R.setup_triangles(data.corners_clip[:tcount], data.valid[:tcount], dims.wp, dims.hp, R.CULL_NONE)
    packf = jax.jit(lambda tri=tri, d=data, tc=tcount: RT.pack_tables(tri, d.corner_uv[:tc], d.corner_nrm[:tc], d.tri_mat[:tc], dims.by, dims.bx))
    tabs = t(f"pack {name} (T={tcount})", packf)
    print(f"   binned pairs: {int(np.asarray(tabs.counts).sum())}")
    zb = jnp.full((dims.b, 4, RT.TILE_H, RT.TILE_W), 1.0)
    rf = jax.jit(lambda z, tabs=tabs: RT.raster_pass_tpu(tabs, z, bx=dims.bx, depth_write=True))
    zb2, gbuf = t(f"raster {name}", rf, zb)
    g = pipeline_tpu._untile_gbuf(gbuf, dims)
    inv_vp = jnp.linalg.inv(vp)
    sf = jax.jit(lambda g: SF.shade_material_fast(g, packed, m.atlas.texels.shape[2], lights, eye, inv_vp, dims.wp, dims.hp, cfg.rim_light_intensity))
    t(f"shade {name}", sf, g)

# physics
st0 = init_scene_state(m).physics
physf = jax.jit(lambda st: solver.step(cfg, m.physics, st, jnp.float32(1 / 60), q, p))
t("physics", physf, st0)

# full fast frame
framef = jax.jit(lambda pos, nrm: pipeline_tpu.render_frame_fast(m, cfg, dims, packed, pos, nrm, vp, eye, lights))
t("FULL fast frame", framef, pos, nrm, n=10)
