"""Dev: fine-grained stage timing of the fast pipeline at arbitrary WxH.

Usage: python scripts/profile_1080.py [W H]
Isolates: per-pass pack/raster/untile, shading sub-stages (one-hot fetch,
albedo gather, toon eval, full shade), physics, skinning, bloom, full frame.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

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

W = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1080

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
P = dims.p
print(f"frame {W}x{H} padded {dims.wp}x{dims.hp} P={P} bins={dims.b} "
      f"atlas={m.atlas.texels.shape} materials={m.materials.alpha.shape[0]}")


def t(name, f, *a, n=20):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)
    return out


# ---- per-pass raster ----
gbufs = {}
zb = jnp.full((dims.b, 4, RT.TILE_H, RT.TILE_W), 1.0)
for cls, name, cull, outline in [
    (CLASS_OPAQUE, "opaque", R.CULL_NONE, False),
    (CLASS_EYE, "eye", R.CULL_FRONT, False),
    (CLASS_OPAQUE, "opaque-outline", R.CULL_BACK, True),
    (CLASS_HAIR, "hair", R.CULL_FRONT, False),
    (CLASS_TRANSPARENT, "transp", R.CULL_NONE, False),
]:
    data = _gather_pass(m, pos, nrm, vp, cls, outline, cfg.outline_scale)
    tcount = min(data.valid.shape[0], RT.MAX_TRIS_PER_CALL)
    tri = R.setup_triangles(data.corners_clip[:tcount], data.valid[:tcount], dims.wp, dims.hp, cull)
    packf = jax.jit(lambda tri=tri, d=data, tc=tcount: RT.pack_tables(
        tri, d.corner_uv[:tc], d.corner_nrm[:tc], d.tri_mat[:tc], dims.by, dims.bx))
    tabs = t(f"pack {name} (T={tcount})", packf)
    npairs = int(np.asarray(tabs.counts).sum())
    rf = jax.jit(lambda z, tabs=tabs: RT.raster_pass_tpu(
        tabs, z, bx=dims.bx, depth_write=True, with_attrs=not outline))
    zb2, gbuf = t(f"raster {name} ({npairs} pairs)", rf, zb)
    if not outline:
        gbufs[name] = gbuf

g = pipeline_tpu._untile_gbuf(gbufs["opaque"], dims)
t("untile gbuf", jax.jit(lambda gb: pipeline_tpu._untile_gbuf(gb, dims)), gbufs["opaque"])

# ---- shading sub-stages ----
mat_f = g[RT.CH_MAT]
covered = float(jnp.mean(mat_f >= 0))
print(f"covered fraction (opaque): {covered:.3f}")

t("fetch_params (one-hot)", jax.jit(lambda mf: SF.fetch_params(jnp.maximum(mf, 0.0), packed)), mat_f)

params = SF.fetch_params(jnp.maximum(mat_f, 0.0), packed)
iw = jnp.maximum(g[RT.CH_IW], 1e-8)
u = g[RT.CH_UIW] / iw
v = g[RT.CH_VIW] / iw
atlas_stride = m.atlas.texels.shape[2]


def albedo_gather(u, v, params):
    tex_id = params[:, 1]
    h = jnp.maximum(params[:, 2], 1.0)
    w = jnp.maximum(params[:, 3], 1.0)
    base = params[:, 4]
    x = jnp.clip(jnp.floor(jnp.mod(u, 1.0) * w), 0.0, w - 1.0)
    y = jnp.clip(jnp.floor(jnp.mod(v, 1.0) * h), 0.0, h - 1.0)
    idx = (base + y * atlas_stride + x).astype(jnp.int32)
    texel = packed.atlas_flat[idx].astype(jnp.float32) * (1.0 / 255.0)
    return jnp.where(tex_id[:, None] >= 0.0, texel[:, :3], 1.0)


t("albedo gather (P idx)", jax.jit(albedo_gather), u, v, params)

knots = params[:, SF.N_FIXED:SF.N_FIXED + SF.N_KNOTS * 3].reshape(-1, SF.N_KNOTS, 3)
nn = jnp.stack([g[RT.CH_NXIW], g[RT.CH_NYIW], g[RT.CH_NZIW]], axis=1) / iw[:, None]
ndotl = jnp.maximum(nn @ -lights.direction[0], 0.0)
t("eval_toon x4", jax.jit(lambda k, x: sum(SF.eval_toon(k, x) for _ in range(4))), knots, ndotl)

shf = jax.jit(lambda g: SF.shade_material_fast(
    g, packed, atlas_stride, lights, eye, inv_vp, dims.wp, dims.hp, cfg.rim_light_intensity))
t("shade_material_fast (full)", shf, g)

# layered: push x7 + composite
stack = SF.empty_stack(P)
t("push_layer", jax.jit(lambda s, g: SF.push_layer(s, g, packed, False)), stack, g)
stack = SF.push_layer(stack, g, packed, False)
t("composite_stack (2 shades)", jax.jit(lambda s: SF.composite_stack(
    s, packed, atlas_stride, lights, eye, inv_vp, dims.wp, dims.hp, cfg.rim_light_intensity)), stack)

# ---- other stages ----
st0 = init_scene_state(m).physics
t("physics step", jax.jit(lambda st: solver.step(cfg, m.physics, st, jnp.float32(1 / 60), q, p)), st0)
t("FK", jax.jit(lambda r: fk.world_transforms(skel, r, jnp.zeros((skel.j, 3)))), rot)
t("skinning", jax.jit(lambda q, p: skin_vertices(
    m.geometry, m.skinning, fk.skin_palette(skel, q, p))), q, p)
img = jnp.zeros((H, W, 3))
t("bloom", jax.jit(lambda im: post.apply_bloom(im, cfg.bloom_threshold, cfg.bloom_intensity)), img)

# ---- full frame ----
framef = jax.jit(lambda pos, nrm: pipeline_tpu.render_frame_fast(
    m, cfg, dims, packed, pos, nrm, vp, eye, lights))
t("FULL fast frame", framef, pos, nrm, n=10)
