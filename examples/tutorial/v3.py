"""Tutorial v3 — textures, toon ramps and per-material draw order.

Reference: web/app/tutorial/engines/v3.ts:24-371 adds per-material
textures and bind groups; the full engine's toon fragment shader samples
a ramp at (n.l, 0.5) (engine.ts:291-300). On TPU a "texture sample" is a
gather: the rasterizer interpolates (u, v) per pixel, the shader converts
them to flat atlas indices, ONE `atlas[idx]` gather fetches every pixel's
texel at once. The material id rides along the depth winner so each pixel
picks its own texture and toon tint — there are no bind groups, just
arrays indexed by data.

Same chunk-scan rasterizer as v2, now carrying interpolated UVs and the
material id per pixel (perspective-correct: interpolate u/w, v/w, 1/w).

Run: python examples/tutorial/v3.py [out.png]
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


def load():
    """Geometry + per-triangle material + a texture atlas via the library
    loader (image decoding is out of scope, like the reference's v3 which
    fetches ready textures)."""
    from reze_tpu.core.build import load_model
    from reze_tpu.core.types import EngineConfig

    built = load_model(MODEL, EngineConfig(width=SIZE, height=SIZE))
    m = built.arrays
    g = m.geometry
    return (g.positions if hasattr(g, "positions") else m.geometry.verts,
            m, built)


def render(m, view_proj):
    g = m.geometry
    verts, nrm, uvs = g.positions, g.normals, g.uvs
    tris, tri_mat = g.tris, g.tri_mat
    pad = (-tris.shape[0]) % CHUNK
    valid = jnp.arange(tris.shape[0] + pad) < tris.shape[0]
    tris = jnp.concatenate([tris, jnp.zeros((pad, 3), tris.dtype)])
    tri_mat = jnp.concatenate([tri_mat, jnp.zeros(pad, tri_mat.dtype)])

    hom = jnp.concatenate([verts, jnp.ones((verts.shape[0], 1))], -1)
    clip = hom @ view_proj.T
    wc = jnp.maximum(clip[:, 3:4], 1e-6)
    ndc = clip[:, :3] / wc
    inv_w = 1.0 / wc[:, 0]

    t = (jnp.arange(SIZE) + 0.5) / SIZE * 2.0 - 1.0
    px, py = jnp.meshgrid(t, -t)

    n = tris.shape[0] // CHUNK
    c_all = ndc[tris].reshape(n, CHUNK, 3, 3)
    uvw_all = (uvs[tris] * inv_w[tris][..., None]).reshape(n, CHUNK, 3, 2)
    nw_all = (nrm[tris] * inv_w[tris][..., None]).reshape(n, CHUNK, 3, 3)
    iw_all = inv_w[tris].reshape(n, CHUNK, 3)
    mat_all = tri_mat.reshape(n, CHUNK)
    dead = (~valid).reshape(n, CHUNK)

    zbuf = jnp.full((SIZE, SIZE), jnp.inf)
    uvb = jnp.zeros((SIZE, SIZE, 2))
    nb = jnp.zeros((SIZE, SIZE, 3))
    iwb = jnp.zeros((SIZE, SIZE))
    matb = jnp.zeros((SIZE, SIZE), jnp.int32)

    def chunk(carry, xs):
        zbuf, uvb, nb, iwb, matb = carry
        c, uvw, nw, iw, mat, dd = xs
        a = c[:, :, 0][..., None, None]
        b = c[:, :, 1][..., None, None]
        e = ((jnp.roll(a, -1, 1) - a) * (py - b)
             - (jnp.roll(b, -1, 1) - b) * (px - a))
        e = jnp.roll(e, -1, 1)                         # (128, 3, H, W)
        area = e.sum(1)
        inside = (e >= 0).all(1) & (area > 0) & ~dd[:, None, None]
        w = e / jnp.where(area[:, None] == 0, 1.0, area[:, None])
        z = (w * c[:, :, 2][..., None, None]).sum(1)
        z = jnp.where(inside & (z > 0) & (z < 1), z, jnp.inf)
        win = jnp.argmin(z, axis=0)                    # (H, W)
        zmin = jnp.min(z, axis=0)
        wb = jnp.take_along_axis(w, win[None, None], 0)[0]  # (3, H, W)
        # winner-corner attributes: (128, 3, k) indexed by win -> (H, W, 3, k)
        uvc, nc, iwc = uvw[win], nw[win], iw[win]
        uv_px = jnp.einsum("chw,hwck->hwk", wb, uvc)
        n_px = jnp.einsum("chw,hwck->hwk", wb, nc)
        iw_px = jnp.einsum("chw,hwc->hw", wb, iwc)
        better = zmin < zbuf
        bet3 = better[..., None]
        return (jnp.where(better, zmin, zbuf),
                jnp.where(bet3, uv_px, uvb),
                jnp.where(bet3, n_px, nb),
                jnp.where(better, iw_px, iwb),
                jnp.where(better, mat[win], matb)), None

    (zbuf, uvb, nb, iwb, matb), _ = jax.lax.scan(
        chunk, (zbuf, uvb, nb, iwb, matb),
        (c_all, uvw_all, nw_all, iw_all, mat_all, dead))

    hit = jnp.isfinite(zbuf)
    iws = jnp.maximum(iwb, 1e-6)
    uv = uvb / iws[..., None]                          # perspective-correct
    nrm_px = nb / iws[..., None]
    nrm_px = nrm_px / jnp.maximum(
        jnp.linalg.norm(nrm_px, axis=-1, keepdims=True), 1e-6)

    # ONE gather fetches every pixel's texel from the atlas; textures are
    # padded to a common (th, tw) tile, actual sizes ride in atlas.sizes
    atlas = m.atlas
    tex_id = m.materials.tex_id[matb]                  # (H, W)
    th, tw = atlas.texels.shape[1], atlas.texels.shape[2]
    sz = atlas.sizes[jnp.maximum(tex_id, 0)]           # (H, W, 2) actual h, w
    u = jnp.clip((uv[..., 0] % 1.0) * (sz[..., 1] - 1), 0, tw - 1)
    v = jnp.clip((uv[..., 1] % 1.0) * (sz[..., 0] - 1), 0, th - 1)
    flat = atlas.texels.reshape(-1, 4)
    idx = (jnp.maximum(tex_id, 0) * (th * tw)
           + v.astype(jnp.int32) * tw + u.astype(jnp.int32))
    albedo = flat[idx].astype(jnp.float32)[..., :3] / 255.0
    albedo = jnp.where((tex_id >= 0)[..., None], albedo, 0.8)

    # two-step toon ramp at (n.l) like the engine's shared ramps
    # light vector = toward the engine's main light (types.DEFAULT_LIGHTS)
    ndl = jnp.clip(
        nrm_px @ jnp.asarray([0.466, 0.745, -0.466]), 0.0, 1.0)
    toon = jnp.where(ndl > 0.5, 1.0, 0.82)[..., None]
    img = albedo * toon
    return jnp.where(hit[..., None], img, 0.05)


if __name__ == "__main__":
    from PIL import Image

    _, m, built = load()
    cam_eye = jnp.asarray([0.0, 17.1, 0.0]) + 13.5 * jnp.asarray(
        [np.sin(np.pi), 0.12, np.cos(np.pi)])
    vp = perspective(jnp.pi / 4, 1.0, 0.05, 100.0) @ look_at(
        cam_eye, jnp.asarray([0.0, 17.1, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    img = np.asarray(jax.jit(lambda m, vp: render(m, vp))(m, vp))
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tut_v3.png"
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(out)
    print("v3 ->", out)
