"""Megakernel cost attribution by TABLE SURGERY (round 4).

Splits the group megakernel's frame cost into
  per-tile constant   (tile init + inline shade + output write): counts := 0
  per-segment constant (pl.when + DMA + resets + push): counts := min(c, 8)
  body                (full - the above)
plus n_samples / analytic variants, WITHOUT touching kernel code: the
pallas_call is timed alone on pre-built FrameTables whose counts are
clipped. Rows/starts stay identical so DMA behavior is representative.

Usage: python scripts/mega_attrib.py [--res=1920x1080]
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
from reze_tpu.render import pipeline, pipeline_tpu as PT, shading_fast as SF
from reze_tpu.skeleton import fk
from reze_tpu.core import math3d as m3

res = "1920x1080"
for a in sys.argv[1:]:
    if a.startswith("--res="):
        res = a.split("=")[1]
W, H = (int(x) for x in res.split("x"))

MODEL = "/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx"
VMD = "/root/reference/web/public/animations/pool.vmd"

cfg = EngineConfig(width=W, height=H, camera_distance=13.5,
                   camera_target=(0.0, 17.1, 0.0))
built = load_model(MODEL, cfg)
m = built.arrays
skel = m.skeleton

# animated pose (t=1.0s) for representative pair distribution
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
print(f"pairs={counts.sum()}  nonempty_segments={nz.sum()}  "
      f"tiles_nonempty={(counts.sum(0) > 0).sum()}/{counts.shape[1]}  "
      f"mean_pairs_per_seg={counts[nz].mean():.1f}  "
      f"p99={np.percentile(counts[nz], 99):.0f}  max={counts.max()}")
# chunk/group accounting
print(f"groups(ceil c/8)={(-(-counts[nz] // 8)).sum()}  "
      f"chunks(ceil c/128)={(-(-counts[nz] // 128)).sum()}")

use_mips, lod_bias = PT._mip_args(cfg, m)


def run_variant(name, tab, n_samples=4, analytic=False):
    def op(c, rows):
        t2 = tab._replace(rows=rows + c * 0)
        out = FT.render_megakernel(
            t2, tables_sh, lights, cfg.rim_light_intensity, eye, inv_vp,
            hp=dims.hp, wp=dims.wp, n_samples=n_samples,
            use_mips=use_mips, lod_bias=lod_bias, analytic=analytic)
        return c + out[0, 0, 0] * 1e-9

    return bench_op(name, op, jnp.float32(0.0), tab.rows, n1=2, n2=22)


full = run_variant("full (msaa4)", ft)
zero = run_variant("counts=0 (tile init+shade+out)",
                   ft._replace(counts=jnp.zeros_like(ft.counts)))
one_group = run_variant("counts<=8 (+1-group body/seg)",
                        ft._replace(counts=jnp.minimum(ft.counts, 8)))
if os.environ.get("MA_QUICK", "0") != "1":
    one_chunk = run_variant("counts<=128", ft._replace(
        counts=jnp.minimum(ft.counts, 128)))
    msaa1 = run_variant("full msaa1", ft, n_samples=1)
    ana = run_variant("full analytic", ft, n_samples=1, analytic=True)

n_seg = int(nz.sum())
n_groups = int((-(-counts[nz] // 8)).sum())
print(f"\nper-tile constant: {zero:.3f} ms total")
print(f"per-segment (incl 1-group body): {(one_group - zero) / n_seg * 1e6:.0f} ns/seg "
      f"({one_group - zero:.3f} ms over {n_seg} segs)")
print(f"body beyond first group: {(full - one_group):.3f} ms over "
      f"{n_groups - n_seg} extra groups = "
      f"{(full - one_group) / max(n_groups - n_seg, 1) * 1e6:.0f} ns/group")
