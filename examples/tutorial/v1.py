"""Tutorial v1 — the arc-rotate camera and the uniform that isn't.

Reference: web/app/tutorial/engines/v1.ts:5-212 adds a spherical-orbit
camera whose view-projection matrix is uploaded to a GPU uniform buffer
every frame. On TPU there is no "upload": the matrix is just another
argument of the jitted render function — pass a different (4, 4) array,
get a different frame, zero recompiles (shapes are static, values are
data).

Left-handed conventions match the reference (math.ts:247-301): camera
position from spherical (alpha, beta, radius) around a target, lookAt with
+Z forward, perspective mapping z to [0, 1].

Run: python examples/tutorial/v1.py [out.png]   (renders 3 orbit angles)
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

SIZE = 384

# a 3-D object this time: a unit tetrahedron with per-vertex colors
VERTS = jnp.asarray([
    [0.0, 1.0, 0.0], [-0.9, -0.6, 0.5], [0.9, -0.6, 0.5], [0.0, -0.6, -1.0],
])
TRIS = jnp.asarray([[0, 1, 2], [0, 2, 3], [0, 3, 1], [1, 3, 2]])
COLORS = jnp.asarray([
    [1.0, 0.4, 0.4], [0.4, 1.0, 0.4], [0.4, 0.5, 1.0], [1.0, 0.9, 0.4],
])


def look_at(eye, target, up):
    """Left-handed lookAt (math.ts:275-301): +Z points at the target."""
    f = target - eye
    f = f / jnp.linalg.norm(f)
    r = jnp.cross(up, f)
    r = r / jnp.linalg.norm(r)
    u = jnp.cross(f, r)
    m = jnp.eye(4)
    m = m.at[0, :3].set(r).at[1, :3].set(u).at[2, :3].set(f)
    t = jnp.stack([-jnp.dot(r, eye), -jnp.dot(u, eye), -jnp.dot(f, eye)])
    return m.at[:3, 3].set(t)


def perspective(fov, aspect, near, far):
    """Left-handed, depth in [0, 1] (math.ts:247-271 / WebGPU clip space)."""
    f = 1.0 / jnp.tan(fov / 2.0)
    m = jnp.zeros((4, 4))
    m = m.at[0, 0].set(f / aspect).at[1, 1].set(f)
    m = m.at[2, 2].set(far / (far - near))
    m = m.at[2, 3].set(-near * far / (far - near))
    return m.at[3, 2].set(1.0)


def orbit_view_proj(alpha, beta, radius):
    eye = radius * jnp.stack([
        jnp.cos(alpha) * jnp.sin(beta), jnp.cos(beta),
        jnp.sin(alpha) * jnp.sin(beta),
    ])
    view = look_at(eye, jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]))
    return perspective(jnp.pi / 4, 1.0, 0.05, 100.0) @ view


@jax.jit
def render(view_proj):
    # project: world -> clip -> NDC (the "vertex shader")
    hom = jnp.concatenate([VERTS, jnp.ones((4, 1))], -1)  # (V, 4)
    clip = hom @ view_proj.T
    ndc = clip[:, :3] / clip[:, 3:4]

    t = (jnp.arange(SIZE) + 0.5) / SIZE * 2.0 - 1.0
    px, py = jnp.meshgrid(t, -t)

    c = ndc[TRIS]  # (T, 3, 3) triangle corners in NDC

    def edges(c):  # evaluate all 4 triangles against all pixels at once
        a, b = c[:, :, 0][..., None, None], c[:, :, 1][..., None, None]
        e = ((jnp.roll(a, -1, 1) - a) * (py - b)
             - (jnp.roll(b, -1, 1) - b) * (px - a))  # (T, 3, H, W)
        return jnp.roll(e, -1, 1)  # e_i opposite corner i

    e = edges(c)
    area = e.sum(1)
    inside = (e >= 0).all(1) & (area > 0)  # LH front faces
    w = e / jnp.where(area[:, None] == 0, 1.0, area[:, None])
    z = (w * c[:, :, 2][..., None, None]).sum(1)  # (T, H, W)
    z = jnp.where(inside, z, jnp.inf)

    # depth resolve across the 4 triangles = argmin over a tiny axis
    win = jnp.argmin(z, axis=0)
    hit = jnp.isfinite(jnp.min(z, axis=0))
    wb = jnp.take_along_axis(w, win[None, None], 0)[0]  # (3, H, W)
    cols = COLORS[TRIS[win]]  # (H, W, 3corners, 3)
    rgb = jnp.einsum("chw,hwck->hwk", wb, cols)
    return jnp.where(hit[..., None], rgb, 0.05)


if __name__ == "__main__":
    from PIL import Image

    frames = [np.asarray(render(orbit_view_proj(a, 1.1, 3.0)))
              for a in (0.5, 1.5, 2.5)]
    img = np.concatenate(frames, axis=1)
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tut_v1.png"
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(out)
    print("v1 ->", out)
