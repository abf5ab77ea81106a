"""Measure the new shade-kernel frame path at 1080p on chip."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from tbench import bench_op

from reze_tpu.camera import Camera
from reze_tpu.core.build import load_model
from reze_tpu.core.types import EngineConfig
from reze_tpu.kernels import shade_tpu as ST
from reze_tpu.kernels.skinning import skin_vertices
from reze_tpu.render import pipeline, pipeline_tpu, post, shading_fast as SF
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

# shade kernel alone
tables = jax.device_put(ST.pack_shade_tables(m.materials, m.atlas))
stack0 = jnp.zeros((2 * ST.L_CH, dims.hp, dims.wp))
# fill ~25% coverage in layer 1 so the skip path isn't trivially hit
stack0 = stack0.at[ST.L_CH + ST.L_AEFF, :300, :].set(0.7)
stack0 = stack0.at[ST.L_CH + ST.L_IW, :300, :].set(0.05)


def shade_op(stk, *tab_leaves):
    tb = ST.ShadeTables(*tab_leaves, tables.atlas_stride)
    out = ST.shade_stack_tpu(stk, tb, lights, None, cfg.rim_light_intensity, eye, inv_vp)
    return stk + out[:1] * 1e-9


bench_op("shade kernel (25% cover)", shade_op, stack0,
         tables.push_tab, tables.knot_tab, tables.tex_tab, tables.edge_tab,
         tables.atlas_flat)

# bloom
img0 = jax.random.normal(jax.random.PRNGKey(1), (H, W, 3))
bench_op("bloom (new upsample)", lambda c: post.apply_bloom(
    jnp.abs(c) * 0.999, cfg.bloom_threshold, cfg.bloom_intensity), img0)


# full frame
def frame_op(c, pos, nrm):
    f = pipeline_tpu.render_frame_fast(
        m, cfg, dims, packed, pos + c * 0, nrm, vp, eye, lights)
    return c + f[0, 0, 0] * 1e-9


bench_op("FULL fast frame", frame_op, jnp.float32(0.0), pos, nrm, n1=2, n2=12)
