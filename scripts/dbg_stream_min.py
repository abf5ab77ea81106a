"""Minimal stream/mxu-kernel debug: one fullscreen triangle, check coverage
per tile (interpret mode, CPU)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

from reze_tpu.kernels import frame_stream as FS
from reze_tpu.kernels import shade_tpu as ST
from reze_tpu.render import raster as R

wp, hp = 128, 16
by, bx = hp // FS.TILE_H, wp // FS.TILE_W

# one huge triangle covering the whole framebuffer at z=0.5
corners = jnp.asarray([
    [[-4.0, -4.0, 0.5, 1.0], [4.0, -4.0, 0.5, 1.0], [0.0, 8.0, 0.5, 1.0]]
])
valid = jnp.ones((1,), bool)
tri = R.setup_triangles(corners, valid, wp, hp, R.CULL_NONE)

tabs, bins = [], []
for p in range(7):
    if p == 0:
        tab, binfo = FS.build_pass_rows(
            tri, jnp.zeros((1, 3, 2)), jnp.zeros((1, 3, 3)),
            jnp.ones((1,)), jnp.zeros((1,)), jnp.zeros((1,)),
            jnp.zeros((1,)), jnp.zeros((1,)), by, bx, 128,
            with_attrs=True,
        )
    else:
        # empty pass: one invalid triangle
        tri0 = R.setup_triangles(corners, jnp.zeros((1,), bool), wp, hp,
                                 R.CULL_NONE)
        tab, binfo = FS.build_pass_rows(
            tri0, jnp.zeros((1, 3, 2)), jnp.zeros((1, 3, 3)),
            jnp.ones((1,)), jnp.zeros((1,)), jnp.zeros((1,)),
            jnp.zeros((1,)), jnp.zeros((1,)), by, bx, 128,
            with_attrs=True,
        )
    tabs.append(tab)
    bins.append(binfo)

st = FS.pack_stream(tabs, bins, by, bx)
print("bounds row0:", np.asarray(st.bounds)[0])
print("bounds row7:", np.asarray(st.bounds)[7])
print("overflow:", int(st.overflow))

  # best keys at 32..38, frag p0 at 39..57
stack_pm = FS.render_megakernel_stream(
    st, hp=hp, wp=wp, n_samples=1, interpret=True)
stack = np.asarray(stack_pm).reshape(by * bx, FS.N_PX, 2 * ST.L_CH)
# l1 aeff channel = L_CH + L_AEFF
aeff = stack[:, :, ST.L_CH + ST.L_AEFF]
z = stack[:, :, ST.L_CH + ST.L_Z]
for b in range(2):
    s = stack[b]
    aeff1 = s[:, ST.L_CH + ST.L_AEFF]
    z1 = s[:, ST.L_CH + ST.L_Z]
    print(f"tile {b}: l1 aeff mean={aeff1.mean():.3f} z mid={z1[512]:.4f} "
          f"outl={s[512, ST.L_CH + ST.L_OUT]:.1f} l0 aeff={s[:, ST.L_AEFF].mean():.4f}")

# ---- numpy emulation of _process_chunk for tile 0 ----
print("\n=== emulation tile 0 ===")
rows = np.asarray(st.rows)
quad = np.asarray(st.quad)
bounds = np.asarray(st.bounds)
b = 0
x0, y0 = 0.0, 0.0
t0, t1 = bounds[0, b], bounds[7, b]
print("t0 t1:", t0, t1)
qd = quad[:, 0:512].copy()  # window 0
fold = qd[0:1] * x0 + qd[1:2] * y0
qd[2:3] += fold
ii = np.arange(1024)
pxy = np.zeros((1024, 8), np.float32)
pxy[:, 0] = ii % 128 + 0.5
pxy[:, 1] = ii // 128 + 0.5
pxy[:, 2] = 1.0
E = pxy @ qd
e0c, e1c, e2c, zc = E[:, 0:128], E[:, 128:256], E[:, 256:384], E[:, 384:512]
print("pair0 e0c range:", e0c[:, 0].min(), e0c[:, 0].max())
print("pair0 e1c range:", e1c[:, 0].min(), e1c[:, 0].max())
print("pair0 e2c range:", e2c[:, 0].min(), e2c[:, 0].max())
print("pair0 zc range:", zc[:, 0].min(), zc[:, 0].max())
print("row0 cols 12..14:", rows[0, 12:15], "ones:", rows[0, 31])

center_ok = (e0c >= 0) & (e1c >= 0) & (e2c >= 0) & (zc >= 0) & (zc <= 1)
print("center_ok count pair0:", center_ok[:, 0].sum())
in_p = (np.arange(128)[None, :] >= bounds[0, b]) & (np.arange(128)[None, :] < bounds[1, b])
print("in_p lanes:", np.nonzero(in_p[0])[0][:5])
