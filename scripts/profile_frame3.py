"""Ablation: time each stage group of the real fast-frame at 1080p."""

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
)
from reze_tpu.kernels import raster_tpu as RT, shade_tpu as ST
from reze_tpu.kernels.skinning import skin_vertices
from reze_tpu.render import pipeline, pipeline_tpu as PT, post, raster, shading_fast as SF
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
dims = PT.make_dims_fast(cfg)
packed = SF.pack_materials(m.materials, m.atlas)
tables = ST.pack_shade_tables(m.materials, m.atlas)
lights = pipeline.make_lights(cfg)
inv_vp = jnp.linalg.inv(vp)

PASSES = [
    (CLASS_OPAQUE, raster.CULL_NONE, False, True),
    (CLASS_EYE, raster.CULL_FRONT, False, True),
    (CLASS_OPAQUE, raster.CULL_BACK, True, True),
    (CLASS_HAIR, raster.CULL_FRONT, False, True),
    (CLASS_HAIR, raster.CULL_BACK, True, False),
    (CLASS_TRANSPARENT, raster.CULL_NONE, False, True),
    (CLASS_TRANSPARENT, raster.CULL_BACK, True, True),
]


def geom_and_pack(pos, nrm):
    """All 7 passes' sliced tables."""
    out = []
    for cls, cull, outline, dw in PASSES:
        data = _gather_pass(m, pos, nrm, vp, cls, outline, cfg.outline_scale)
        t = data.valid.shape[0]
        n_slices = max(-(-t // RT.MAX_TRIS_PER_CALL), 1)
        sl_tabs = []
        for si in range(n_slices):
            lo = si * RT.MAX_TRIS_PER_CALL
            hi = min(t, lo + RT.MAX_TRIS_PER_CALL)
            tri = raster.setup_triangles(
                data.corners_clip[lo:hi], data.valid[lo:hi], dims.wp, dims.hp, cull)
            sl_tabs.append(RT.pack_tables(
                tri, data.corner_uv[lo:hi], data.corner_nrm[lo:hi],
                data.tri_mat[lo:hi], dims.by, dims.bx))
        out.append(sl_tabs)
    return out


def stage_geom(c, pos, nrm):
    tabs = geom_and_pack(pos + c * 0, nrm)
    acc = c
    for sl in tabs:
        for tb in sl:
            acc = acc + tb.tab[0, 0] * 1e-12
    return acc


bench_op("geom+pack all 7 passes", stage_geom, jnp.float32(0.0), pos, nrm)

all_tabs = jax.device_put(geom_and_pack(pos, nrm))
n_pairs = sum(int(np.asarray(tb.counts).sum()) for sl in all_tabs for tb in sl)
n_calls = sum(len(sl) for sl in all_tabs)
print(f"total pairs {n_pairs}, raster calls {n_calls}")


def stage_raster(zb, *leaves):
    # rebuild tables pytree from leaves
    flat_tabs = []
    it = iter(leaves)
    for sl in all_tabs:
        flat_tabs.append([RT.PassTables(*(next(it) for _ in range(5))) for _ in sl])
    zb = jnp.minimum(zb, 1.0)
    acc = 0.0
    for (cls, cull, outline, dw), sl in zip(PASSES, flat_tabs):
        for tb in sl:
            zb, gbuf = RT.raster_pass_tpu(tb, zb, bx=dims.bx, depth_write=dw,
                                          with_attrs=not outline)
            acc = acc + gbuf[RT.CH_COVER, 0, 0] * 1e-9
    return zb + acc


leaves = [l for sl in all_tabs for tb in sl for l in tb]
zb0 = jnp.full((4, dims.hp, dims.wp), 1.0)
ms = bench_op(f"raster all ({n_calls} calls, {n_pairs} pairs)", stage_raster, zb0, *leaves)
print(f"  -> {ms / n_pairs * 1e6:.0f} ns/pair")

# push stage: 7 pushes on one fixed gbuf
zb1, gbuf1 = RT.raster_pass_tpu(all_tabs[0][0], zb0, bx=dims.bx, depth_write=True)
gbuf1 = jax.device_put(gbuf1)


def stage_push(stack, gbuf):
    stencil = jnp.zeros((dims.p,), bool)
    # reuse the pipeline's push via render_frame internals: inline a lean copy
    for i, (cls, cull, outline, dw) in enumerate(PASSES):
        g = gbuf.reshape(RT.N_CH, dims.p)
        mat = g[RT.CH_MAT]
        cover = g[RT.CH_COVER]
        mm = tables.push_tab.shape[0]
        onehot = (jnp.maximum(mat, 0.0)[:, None] == jnp.arange(mm, dtype=jnp.float32)[None, :]).astype(jnp.float32)
        cols = onehot @ tables.push_tab
        a = cols[:, 1] if outline else cols[:, 0]
        a_eff = a * cover
        present = (mat >= 0.0) & (a_eff >= 0.001)
        a_eff = jnp.where(present, a_eff, 0.0)
        opaque = present & (a_eff > 0.999)
        translucent = present & ~opaque
        frag = jnp.stack([
            g[RT.CH_UIW], g[RT.CH_VIW], g[RT.CH_NXIW], g[RT.CH_NYIW],
            g[RT.CH_NZIW], g[RT.CH_IW], g[RT.CH_Z], a_eff,
            jnp.full(dims.p, 1.0 if outline else 0.0),
            cols[:, 4], cols[:, 5], cols[:, 6],
        ])
        st = stack.reshape(2 * ST.L_CH, dims.p)
        l0, l1 = st[: ST.L_CH], st[ST.L_CH:]
        l1p = l1[ST.L_AEFF] > 0.0
        new_l0 = jnp.where(opaque, 0.0, jnp.where(translucent & l1p, l1, l0))
        new_l1 = jnp.where(present, frag, l1)
        stack = jnp.concatenate([new_l0, new_l1]).reshape(stack.shape)
    return stack


stack0 = jnp.zeros((2 * ST.L_CH, dims.hp, dims.wp))
bench_op("push x7", stage_push, stack0, gbuf1)

# shade + albedo + composite
stack1 = jax.device_put(stage_push(stack0, gbuf1))


def stage_shade_comp(c, stack):
    stack = stack + c * 0
    shaded = ST.shade_stack_tpu(stack, tables, lights, None,
                                cfg.rim_light_intensity, eye, inv_vp)
    o = shaded.reshape(2 * ST.O_CH, dims.p)
    st = stack.reshape(2 * ST.L_CH, dims.p)
    color = jnp.zeros((dims.p, 3))
    for layer in range(2):
        base = layer * ST.O_CH
        albedo = PT._fetch_albedo(packed.atlas_flat, o, base, dims,
                                  bilinear=False, half_res=(layer == 0))
        lit = jnp.stack([o[base + ST.O_LR], o[base + ST.O_LG], o[base + ST.O_LB]], axis=1)
        rgb = albedo * lit + o[base + ST.O_RIM][:, None]
        a = st[layer * ST.L_CH + ST.L_AEFF][:, None]
        color = rgb * a + color * (1.0 - a)
    return c + color[0, 0] * 1e-9


bench_op("shade+albedo+composite", stage_shade_comp, jnp.float32(0.0), stack1)

# bloom pieces
img0 = jax.random.normal(jax.random.PRNGKey(1), (H, W, 3))
bench_op("bloom full", lambda c: post.apply_bloom(jnp.abs(c) * 0.999, 0.3, 0.13), img0)
half0 = jax.random.normal(jax.random.PRNGKey(2), (H // 2, W // 2, 3))
bench_op("bloom blur only (half-res)", lambda c: post.gaussian_blur(jnp.abs(c) * 0.999), half0)
bench_op("bloom up2 only", lambda c: post.upsample2x(jnp.abs(c[:H//2, :W//2] * 0.999), H, W) * 1e-9 + c,
         img0)
def _de(c):
    e = post.extract(post.downsample2x(jnp.abs(c) * 0.999), 0.3)
    return c + jnp.repeat(jnp.repeat(e, 2, 0), 2, 1) * 1e-9
bench_op("bloom downsample+extract", _de, img0)
