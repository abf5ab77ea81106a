"""Measure the color-sliced physics + exact-enumeration pack on chip."""

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
from reze_tpu.core.types import CLASS_OPAQUE, EngineConfig, init_scene_state
from reze_tpu.kernels import raster_tpu as RT
from reze_tpu.kernels.skinning import skin_vertices
from reze_tpu.physics import solver
from reze_tpu.render import pipeline, pipeline_tpu, raster as R
from reze_tpu.render.pipeline import _gather_pass
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
vp = cam.view_proj()
dims = pipeline_tpu.make_dims_fast(cfg)

st0 = init_scene_state(m).physics
pmj = jax.device_put(m.physics)


def phys_op(carry, wq, wp):
    st, acc = carry
    nwq, nwp, st2 = solver.step(cfg, pmj, st, jnp.float32(1 / 60), wq, wp)
    return (st2, acc + nwq[0, 0] * 1e-9)


bench_op("physics step (new)", phys_op, (st0, jnp.float32(0)), q, p)

# pack with new exact enumeration, raster with new tables
data = _gather_pass(m, pos, nrm, vp, CLASS_OPAQUE, False, cfg.outline_scale)
tc = min(data.valid.shape[0], RT.MAX_TRIS_PER_CALL)
cc = data.corners_clip[:tc]


def pack_op(cc, uv, nr, mt):
    tri = R.setup_triangles(cc, jnp.ones(tc, bool), dims.wp, dims.hp, R.CULL_NONE)
    tb = RT.pack_tables(tri, uv, nr, mt, dims.by, dims.bx)
    return cc + tb.tri_tab[0, 0] * 1e-12 + tb.overflow.astype(jnp.float32) * 1e-12


bench_op("setup+pack (exact enum)", pack_op, cc,
         data.corner_uv[:tc], data.corner_nrm[:tc], data.tri_mat[:tc])

tri = R.setup_triangles(cc, data.valid[:tc], dims.wp, dims.hp, R.CULL_NONE)
tabs = jax.device_put(RT.pack_tables(
    tri, data.corner_uv[:tc], data.corner_nrm[:tc], data.tri_mat[:tc], dims.by, dims.bx))
npairs = int(np.asarray(tabs.counts).sum())
print(f"pairs: {npairs}, overflow: {int(tabs.overflow)}")
zb0 = jnp.full((4, dims.hp, dims.wp), 1.0)


def raster_op(zb, *tabs_leaves):
    tabs_ = RT.PassTables(*tabs_leaves)
    zb2, gbuf = RT.raster_pass_tpu(tabs_, jnp.minimum(zb, 1.0), bx=dims.bx, depth_write=True)
    return zb2 + gbuf[RT.CH_COVER : RT.CH_COVER + 1] * 1e-9


ms = bench_op(f"raster opaque ({npairs} pairs)", raster_op, zb0, *tabs)
print(f"  -> {ms / max(npairs,1) * 1e6:.0f} ns/pair")
