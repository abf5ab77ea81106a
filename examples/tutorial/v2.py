"""Tutorial v2 — the real character's geometry and a depth buffer.

Reference: web/app/tutorial/engines/v2.ts:11-241 loads pre-dumped indexed
character geometry, and v3_2.ts adds the depth buffer. One triangle at a
time doesn't scale to 90k triangles, and neither does "all triangles x
all pixels" (that's a 90k x 37k matrix). The TPU idiom in between is
`lax.scan` over CHUNKS of triangles, carrying the framebuffer: each step
rasterizes 128 triangles against the whole image as one (128, H, W)
vector op and folds them into the running (z, color) buffers with a
masked min — the scan IS the depth test. All shapes static, no dynamic
control flow, one jit.

Geometry comes straight from the PMX file via reze_tpu's parser (the
reference's v2 also treats parsing as out of scope and ships model.json).

Run: python examples/tutorial/v2.py [out.png]
"""

import os
import sys

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from examples.tutorial.v1 import look_at, perspective  # noqa: E402

SIZE = 256
CHUNK = 128
MODEL = "/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx"


def load_geometry():
    from reze_tpu.formats.pmx import parse_pmx

    pmx = parse_pmx(open(MODEL, "rb").read())
    verts = jnp.asarray(pmx.positions)  # (V, 3)
    nrm = jnp.asarray(pmx.normals)
    tris = jnp.asarray(pmx.indices.reshape(-1, 3))
    pad = (-tris.shape[0]) % CHUNK
    tris = jnp.concatenate([tris, jnp.zeros((pad, 3), tris.dtype)])
    valid = jnp.arange(tris.shape[0]) < tris.shape[0] - pad
    return verts, nrm, tris, valid


def render(verts, nrm, tris, valid, view_proj):
    hom = jnp.concatenate([verts, jnp.ones((verts.shape[0], 1))], -1)
    clip = hom @ view_proj.T
    ndc = clip[:, :3] / jnp.maximum(clip[:, 3:4], 1e-6)
    behind = clip[:, 3] <= 0.0

    t = (jnp.arange(SIZE) + 0.5) / SIZE * 2.0 - 1.0
    px, py = jnp.meshgrid(t, -t)

    c_all = ndc[tris].reshape(-1, CHUNK, 3, 3)       # (n, 128, 3, 3)
    n_all = nrm[tris].reshape(-1, CHUNK, 3, 3)
    bad = (behind[tris].any(-1) | ~valid).reshape(-1, CHUNK)

    def chunk(carry, xs):
        zbuf, color = carry
        c, n, dead = xs  # (128, 3, 3), (128, 3, 3), (128,)
        a = c[:, :, 0][..., None, None]
        b = c[:, :, 1][..., None, None]
        e = ((jnp.roll(a, -1, 1) - a) * (py - b)
             - (jnp.roll(b, -1, 1) - b) * (px - a))
        e = jnp.roll(e, -1, 1)                        # (128, 3, H, W)
        area = e.sum(1)
        inside = (e >= 0).all(1) & (area > 0) & ~dead[:, None, None]
        w = e / jnp.where(area[:, None] == 0, 1.0, area[:, None])
        z = (w * c[:, :, 2][..., None, None]).sum(1)
        z = jnp.where(inside & (z > 0) & (z < 1), z, jnp.inf)
        win = jnp.argmin(z, axis=0)                   # (H, W) in-chunk winner
        zmin = jnp.min(z, axis=0)
        # flat shading: the winner's face normal vs a fixed light
        nf = n.mean(1)                                # (128, 3) face normal
        nf = nf / jnp.maximum(jnp.linalg.norm(nf, axis=-1, keepdims=True), 1e-6)
        # light vector = toward the engine's main light (types.DEFAULT_LIGHTS)
        lit = 0.25 + 0.75 * jnp.clip(
            nf @ jnp.asarray([0.466, 0.745, -0.466]), 0, 1)
        shade = lit[win][..., None] * jnp.asarray([0.8, 0.82, 0.9])
        better = zmin < zbuf
        return (jnp.where(better, zmin, zbuf),
                jnp.where(better[..., None], shade, color)), None

    zbuf0 = jnp.full((SIZE, SIZE), jnp.inf)
    color0 = jnp.full((SIZE, SIZE, 3), 0.05)
    (zbuf, color), _ = jax.lax.scan(chunk, (zbuf0, color0), (c_all, n_all, bad))
    return color


if __name__ == "__main__":
    from PIL import Image

    verts, nrm, tris, valid = load_geometry()
    cam_eye = jnp.asarray([0.0, 17.1, 0.0]) + 13.5 * jnp.asarray(
        [np.sin(np.pi), 0.12, np.cos(np.pi)])
    vp = perspective(jnp.pi / 4, 1.0, 0.05, 100.0) @ look_at(
        cam_eye, jnp.asarray([0.0, 17.1, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    img = np.asarray(jax.jit(render)(verts, nrm, tris, valid, vp))
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tut_v2.png"
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(out)
    print("v2 ->", out)
