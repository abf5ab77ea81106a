"""TRUE per-stage device times at 1080p (scan-delta harness, arg-passed)."""

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
from reze_tpu.core.types import (
    CLASS_EYE, CLASS_HAIR, CLASS_OPAQUE, CLASS_TRANSPARENT, EngineConfig,
    init_scene_state,
)
from reze_tpu.kernels import raster_tpu as RT
from reze_tpu.kernels.skinning import skin_vertices
from reze_tpu.physics import solver
from reze_tpu.render import pipeline, pipeline_tpu, post, raster as R, shading_fast as SF
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
vp, eye = cam.view_proj(), cam.position()
dims = pipeline_tpu.make_dims_fast(cfg)
packed = SF.pack_materials(m.materials, m.atlas)
lights = pipeline.make_lights(cfg)
inv_vp = jnp.linalg.inv(vp)

# ---- raster pass, tables as consts (resident), zbuf as carry ----
data = _gather_pass(m, pos, nrm, vp, CLASS_OPAQUE, False, cfg.outline_scale)
tc = min(data.valid.shape[0], RT.MAX_TRIS_PER_CALL)
tri = R.setup_triangles(data.corners_clip[:tc], data.valid[:tc], dims.wp, dims.hp, R.CULL_NONE)
tabs = RT.pack_tables(tri, data.corner_uv[:tc], data.corner_nrm[:tc], data.tri_mat[:tc], dims.by, dims.bx)
tabs = jax.device_put(tabs)
npairs = int(np.asarray(tabs.counts).sum())
zb0 = jnp.full((dims.b, 4, RT.TILE_H, RT.TILE_W), 1.0)


def raster_op(zb, *tabs_leaves):
    tabs_ = RT.PassTables(*tabs_leaves)
    zb2, gbuf = RT.raster_pass_tpu(tabs_, jnp.minimum(zb, 1.0), bx=dims.bx, depth_write=True)
    return zb2 + gbuf[:, RT.CH_COVER : RT.CH_COVER + 1] * 1e-9


ms = bench_op(f"raster opaque ({npairs} pairs)", raster_op, zb0, *tabs)
print(f"  -> {ms / max(npairs,1) * 1e6:.0f} ns/pair")

# with_attrs=False variant
def raster_noattr(zb, *tabs_leaves):
    tabs_ = RT.PassTables(*tabs_leaves)
    zb2, gbuf = RT.raster_pass_tpu(tabs_, jnp.minimum(zb, 1.0), bx=dims.bx, depth_write=True, with_attrs=False)
    return zb2 + gbuf[:, RT.CH_COVER : RT.CH_COVER + 1] * 1e-9


bench_op("raster opaque no-attrs", raster_noattr, zb0, *tabs)

# ---- pack_tables (true cost) ----
cc = data.corners_clip[:tc]


def pack_op(cc, uv, nr, mt):
    tri = R.setup_triangles(cc, jnp.ones(tc, bool), dims.wp, dims.hp, R.CULL_NONE)
    tb = RT.pack_tables(tri, uv, nr, mt, dims.by, dims.bx)
    return cc + tb.tri_tab[0, 0] * 1e-12


bench_op("setup+pack opaque", pack_op, cc,
         data.corner_uv[:tc], data.corner_nrm[:tc], data.tri_mat[:tc])

# ---- physics ----
st0 = init_scene_state(m).physics
pmj = jax.device_put(m.physics)


def phys_op(carry, wq, wp):
    st, i = carry
    nwq, nwp, st2 = solver.step(cfg, pmj, st, jnp.float32(1 / 60), wq, wp)
    return (st2, i + nwq[0, 0] * 1e-9)


ms = bench_op("physics step", lambda c, wq, wp: phys_op(c, wq, wp), (st0, jnp.float32(0)), q, p)

# ---- shade ----
zb2, gbuf = RT.raster_pass_tpu(tabs, zb0, bx=dims.bx, depth_write=True)
g = pipeline_tpu._untile_gbuf(gbuf, dims)
g = jax.device_put(g)


def shade_op(c, g, table, flat):
    pk = SF.PackedMaterials(table, flat)
    rgb, a, cov, mk = SF.shade_material_fast(
        g + c * 0, pk, m.atlas.texels.shape[2], lights, eye, inv_vp,
        dims.wp, dims.hp, cfg.rim_light_intensity)
    return c + rgb[0, 0] * 1e-9


bench_op("shade_material_fast", lambda c, g, tb, fl: shade_op(c, g, tb, fl),
         jnp.float32(0.0), g, packed.table, packed.atlas_flat)

# shade without the albedo gather
def shade_noalb_op(c, g, table):
    pk = SF.PackedMaterials(table, packed.atlas_flat[:8])
    gg = g + c * 0
    mat_f = gg[RT.CH_MAT]
    params = SF.fetch_params(jnp.maximum(mat_f, 0.0), pk)
    iw = jnp.maximum(gg[RT.CH_IW], 1e-8)
    n = jnp.stack([gg[RT.CH_NXIW], gg[RT.CH_NYIW], gg[RT.CH_NZIW]], axis=1) / iw[:, None]
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=1, keepdims=True), 1e-8)
    knots = params[:, SF.N_FIXED:SF.N_FIXED + SF.N_KNOTS * 3].reshape(-1, SF.N_KNOTS, 3)
    acc = jnp.zeros((mat_f.shape[0], 3))
    for i in range(4):
        ndotl = jnp.maximum(n @ -lights.direction[i], 0.0)
        acc = acc + SF.eval_toon(knots, ndotl) * ndotl[:, None]
    return c + acc[0, 0] * 1e-9


bench_op("shade minus albedo (4 lights)", shade_noalb_op, jnp.float32(0.0), g, packed.table)

# ---- bloom ----
img0 = jax.random.normal(jax.random.PRNGKey(1), (H, W, 3))
bench_op("bloom", lambda c: post.apply_bloom(jnp.abs(c) * 0.999, cfg.bloom_threshold, cfg.bloom_intensity), img0)

# ---- FK / skin ----
bench_op("FK", lambda r: fk.world_transforms(skel, r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True), 1e-6), jnp.zeros((skel.j, 3)))[0] * 1e-9 + r, rot + 0.0)


def skin_op(c, q, p):
    pal = fk.skin_palette(skel, q, p + c * 1e-12)
    po, nr = skin_vertices(m.geometry, m.skinning, pal)
    return c + po[0, 0] * 1e-9


bench_op("skin_palette+skinning", skin_op, jnp.float32(0.0), q, p)

# ---- full frame ----
def frame_op(c, pos, nrm):
    f = pipeline_tpu.render_frame_fast(
        m, cfg, dims, packed, pos + c * 0, nrm, vp, eye, lights)
    return c + f[0, 0, 0] * 1e-9


bench_op("FULL fast frame", frame_op, jnp.float32(0.0), pos, nrm, n1=2, n2=12)
