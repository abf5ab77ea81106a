"""Megakernel-only sweep of (GROUP, YBAND) on the real 1080p workload.

Round-5 kernel-body levers (docs/DESIGN.md "round 5"): bigger sublane
groups amortize winner bookkeeping; the y-band dynamic row loop skips
tile rows a group provably cannot touch (pairs are ymin-row sorted).
Times the pallas_call alone (tbench scan-delta) on the same animated-pose
FrameTables as scripts/mega_attrib.py.

Usage: python scripts/mb_group.py [--res=1920x1080] [--combos=8F,8T,16T,32T]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from tbench import bench_op

from reze_tpu.anim import sampler
from reze_tpu.camera import Camera
from reze_tpu.core.build import load_model
from reze_tpu.core.types import EngineConfig
from reze_tpu.formats.vmd import load_vmd
from reze_tpu.kernels import frame_tpu as FT, shade_tpu as ST
from reze_tpu.kernels.skinning import skin_vertices
from reze_tpu.render import pipeline, pipeline_tpu as PT
from reze_tpu.skeleton import fk
from reze_tpu.core import math3d as m3

res = "1920x1080"
combos = "8F,8T,16F,16T,32F,32T"
modes = "msaa"
for a in sys.argv[1:]:
    if a.startswith("--res="):
        res = a.split("=")[1]
    if a.startswith("--combos="):
        combos = a.split("=")[1]
    if a.startswith("--modes="):
        modes = a.split("=")[1]
W, H = (int(x) for x in res.split("x"))

MODEL = "/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx"
VMD = "/root/reference/web/public/animations/pool.vmd"

cfg = EngineConfig(width=W, height=H, camera_distance=13.5,
                   camera_target=(0.0, 17.1, 0.0))
built = load_model(MODEL, cfg)
m = built.arrays
skel = m.skeleton

track = jax.device_put(sampler.build_animation(
    load_vmd(VMD), built.bone_name_to_id, built.morph_name_to_id,
    skel.j, m.morphs.offsets.shape[0]))
rot = jnp.zeros((skel.j, 4)).at[:, 3].set(1.0)
srot, strans = sampler.sample_bones(track, jnp.float32(1.0))
rot = jnp.where(track.has_track[:, None], srot, rot)
trans = jnp.where(track.has_track[:, None], strans, jnp.zeros((skel.j, 3)))
q, p = fk.world_transforms(skel, rot, trans)
pos, nrm = skin_vertices(m.geometry, m.skinning, fk.skin_palette(skel, q, p))
cam = Camera(radius=13.5, target=(0.0, 17.1, 0.0), aspect=W / H)
vp, eye = cam.view_proj(), cam.position()
dims = PT.make_dims_fast(cfg)
lights = pipeline.make_lights(cfg)
tables_sh = ST.pack_shade_tables(m.materials, m.atlas)
inv_vp = m3.mat4_inverse(vp)

ft = jax.jit(lambda pos, nrm: PT._build_group_tables(
    m, cfg, dims, tables_sh, pos, nrm, vp, None))(pos, nrm)
ft = jax.device_put(jax.tree.map(np.asarray, ft))
counts = np.asarray(ft.counts)
nz = counts > 0
print(f"pairs={counts.sum()}  segs={nz.sum()}  "
      f"mean_pairs/seg={counts[nz].mean():.1f}", flush=True)

use_mips, lod_bias = PT._mip_args(cfg, m)


def run_variant(name, group, yband, n_samples=4, analytic=False):
    def op(c, rows):
        t2 = ft._replace(rows=rows + c * 0)
        out = FT.render_megakernel(
            t2, tables_sh, lights, cfg.rim_light_intensity, eye, inv_vp,
            hp=dims.hp, wp=dims.wp, n_samples=n_samples,
            use_mips=use_mips, lod_bias=lod_bias, analytic=analytic,
            group=group, yband=yband)
        return c + out[0, 0, 0] * 1e-9

    return bench_op(name, op, jnp.float32(0.0), ft.rows, n1=2, n2=22)


for mode in modes.split(","):
    ana = mode == "analytic"
    ns = 1 if ana else 4
    for c in combos.split(","):
        g = int(c[:-1])
        yb = c[-1] == "T"
        run_variant(f"{mode} group={g} yband={yb}", g, yb,
                    n_samples=ns, analytic=ana)
