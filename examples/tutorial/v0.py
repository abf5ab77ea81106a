"""Tutorial v0 — one triangle, the whole pipeline in 60 lines.

Reference: web/app/tutorial/engines/v0.ts:2-133 draws a single colored
clip-space triangle through a WebGPU render pipeline. The TPU has no
fixed-function rasterizer, so THIS stage already contains the idea every
later stage builds on: rasterization is just vectorized math over a pixel
grid. Edge functions e_i(x, y) = cross(corner_{i+1} - corner_i, p -
corner_i) are positive inside the triangle; evaluated for ALL pixels at
once they are three (H, W) arrays — a perfect VPU workload. No loops, no
branches, one jitted function.

Run: python examples/tutorial/v0.py [out.png]
"""

import os
import sys

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the sandbox preregisters the TPU plugin; honor the env override
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

# clip-space corners (x, y) and per-corner colors — v0.ts:15-23
CORNERS = jnp.asarray([[0.0, 0.6], [-0.6, -0.6], [0.6, -0.6]])
COLORS = jnp.asarray([[1.0, 0.3, 0.4], [0.3, 1.0, 0.4], [0.3, 0.4, 1.0]])
SIZE = 384


@jax.jit
def render():
    # pixel grid in clip space: x right, y UP (flip the row axis)
    t = (jnp.arange(SIZE) + 0.5) / SIZE * 2.0 - 1.0
    px, py = jnp.meshgrid(t, -t)  # (H, W) each

    def edge(a, b):
        # signed area of (a -> b -> pixel); positive = left of the edge
        return (b[0] - a[0]) * (py - a[1]) - (b[1] - a[1]) * (px - a[0])

    e0 = edge(CORNERS[1], CORNERS[2])  # opposite corner 0
    e1 = edge(CORNERS[2], CORNERS[0])
    e2 = edge(CORNERS[0], CORNERS[1])
    inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)

    # the same edge values ARE the barycentric weights (v0 has no depth)
    area = e0 + e1 + e2
    w = jnp.stack([e0, e1, e2], -1) / area[..., None]  # (H, W, 3)
    rgb = w @ COLORS  # (H, W, 3) interpolated color
    return jnp.where(inside[..., None], rgb, 0.05)


if __name__ == "__main__":
    from PIL import Image

    img = np.asarray(render())
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tut_v0.png"
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(out)
    print("v0 ->", out)
