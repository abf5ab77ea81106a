"""How to render an anime character on a TPU — the tutorial ladder.

The reference ships five progressively richer mini-engines
(web/app/tutorial/engines/v0..v4.ts: triangle -> camera -> character
geometry -> textures -> bones+skinning). This is the same ladder built on
reze-tpu's public pieces, one stage per flag:

  --stage 0   one triangle through the software rasterizer
  --stage 1   arc-rotate camera + perspective projection
  --stage 2   the real PMX character's geometry, flat shaded
  --stage 3   textures + toon ramps + material passes
  --stage 4   bones: rotate 腰/首 via the skinning palette (v4.ts:661)

Usage: python examples/tutorial.py --stage 4 [--out /tmp/tut.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--stage", type=int, default=4)
parser.add_argument("--size", type=int, default=384)
parser.add_argument("--out", default="/tmp/tutorial.png")
args = parser.parse_args()

import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # the sandbox preregisters the TPU plugin; honor the env override
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

import reze_tpu  # noqa: E402,F401  (enables the compile cache)
from reze_tpu.camera import Camera  # noqa: E402
from reze_tpu.core import math3d as m3  # noqa: E402
from reze_tpu.render import raster as R  # noqa: E402

SIZE = args.size
MODEL = "/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx"


def save(img):
    Image.fromarray((np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)).save(args.out)
    print(f"stage {args.stage} -> {args.out}")


def rasterize_flat(corners_clip, colors, size):
    """Minimal forward rasterization: one pass, flat per-triangle colors."""
    tile, bx, by = 64, size // 64, size // 64
    tri = R.setup_triangles(corners_clip, jnp.ones(len(colors), bool), size, size, R.CULL_NONE)
    bins = R.bin_triangles(tri, by, bx, tile, max(((len(colors) + 7) // 8) * 8, 8))
    zbuf = jnp.full((bx * by, 4, tile, tile), 1.0)
    out = R.rasterize_pass(tri, bins, zbuf, tile=tile, bx=bx, depth_write=True)
    pix = R.tiles_to_image(out.pix_tri, by, bx, tile)
    cover = R.tiles_to_image(out.cover, by, bx, tile)
    rgb = jnp.where(
        (pix >= 0)[..., None], jnp.asarray(colors)[jnp.maximum(pix, 0)], 0.0
    )
    return rgb * cover[..., None]


if args.stage == 0:
    # v0.ts: a single colored triangle in clip space
    corners = jnp.asarray([[[-0.6, -0.6, 0.5, 1.0], [0.6, -0.6, 0.5, 1.0], [0.0, 0.7, 0.5, 1.0]]])
    save(rasterize_flat(corners, [[1.0, 0.45, 0.55]], SIZE))

elif args.stage == 1:
    # v1.ts: the same triangle seen through an arc-rotate camera
    cam = Camera(alpha=np.pi * 0.85, beta=np.pi / 2.2, radius=4.0, target=(0, 0, 0), aspect=1.0)
    world = jnp.asarray([[[-1.0, -1.0, 0.0], [1.0, -1.0, 0.0], [0.0, 1.2, 0.0]]])
    clip = R.project_corners(world, cam.view_proj())
    save(rasterize_flat(clip, [[0.4, 0.75, 1.0]], SIZE))

elif args.stage >= 2:
    from reze_tpu.core.build import load_model
    from reze_tpu.core.types import EngineConfig
    from reze_tpu.kernels.skinning import skin_vertices
    from reze_tpu.render import pipeline
    from reze_tpu.skeleton import fk

    cfg = EngineConfig(width=SIZE, height=SIZE, camera_distance=13.5,
                       camera_target=(0.0, 17.1, 0.0), max_tris_per_bin=4096,
                       renderer="xla", enable_bloom=args.stage >= 3)
    built = load_model(MODEL, cfg)
    mdl = built.arrays
    skel = mdl.skeleton
    rot = jnp.zeros((skel.j, 4)).at[:, 3].set(1.0)

    if args.stage == 4:
        # v4.ts rotateBone: pose 腰 (waist) and 首 (neck)
        for name, angle in (("腰", 0.25), ("首", -0.3)):
            bid = built.bone_name_to_id[name]
            rot = rot.at[bid].set(m3.quat_from_euler_zxy(jnp.asarray([angle, 0.2, 0.0])))

    q, p = fk.world_transforms(skel, rot, jnp.zeros((skel.j, 3)))
    pos, nrm = skin_vertices(mdl.geometry, mdl.skinning, fk.skin_palette(skel, q, p))
    cam = Camera(radius=13.5, target=(0.0, 17.1, 0.0), aspect=1.0)

    if args.stage == 2:
        # flat normal-shaded geometry (pre-texture, like v2.ts's gray mesh)
        clip = R.project_corners(pos[mdl.geometry.tris], cam.view_proj())
        shade = jnp.clip(-nrm[mdl.geometry.tris[:, 0]][:, 2:3] * 0.5 + 0.6, 0, 1)
        colors = jnp.repeat(shade, 3, axis=1)
        save(rasterize_flat(clip, colors, SIZE))
    else:
        dims = pipeline.make_dims(cfg)
        lights = pipeline.make_lights(cfg)
        img = jax.jit(
            lambda a, b: pipeline.render_frame(
                mdl, cfg, dims, a, b, cam.view_proj(), cam.position(), lights
            )
        )(pos, nrm)
        save(img)
