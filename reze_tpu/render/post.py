"""Bloom post-processing chain (engine.ts:983-1217, 2255-2352).

extract (half res, threshold) -> separable Gaussian blur H+V -> compose.
The reference's "3-tap with bilinear trick" blur (engine.ts:1060-1075) is
mathematically the 5-tap kernel [0.06136, 0.24477, 0.38774, 0.24477,
0.06136]; we apply that kernel exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_W = (0.06136, 0.24477, 0.38774, 0.24477, 0.06136)


def downsample2x(img: Array) -> Array:
    """(H, W, C) -> (H//2, W//2, C) box filter (bilinear at half-res centers)."""
    h, w, c = img.shape
    return img[: h // 2 * 2, : w // 2 * 2].reshape(h // 2, 2, w // 2, 2, c).mean((1, 3))


def upsample2x(img: Array, out_h: int, out_w: int) -> Array:
    """Bilinear 2x upsample to (out_h, out_w, C)."""
    return jax.image.resize(img, (out_h, out_w, img.shape[-1]), method="bilinear")


def extract(img: Array, threshold: float) -> Array:
    """max(0, rgb - t) / max(0.001, 1 - t)  (engine.ts:1018-1023)."""
    return jnp.maximum(img - threshold, 0.0) / max(1.0 - threshold, 0.001)


def _blur_axis(img: Array, axis: int) -> Array:
    out = img * _W[2]
    for k, wgt in ((1, _W[1]), (2, _W[0])):
        # clamp-to-edge addressing (engine.ts:1157-1162)
        fwd = jnp.concatenate(
            [
                jax.lax.slice_in_dim(img, k, img.shape[axis], axis=axis),
                jnp.repeat(jax.lax.slice_in_dim(img, img.shape[axis] - 1, img.shape[axis], axis=axis), k, axis=axis),
            ],
            axis=axis,
        )
        bwd = jnp.concatenate(
            [
                jnp.repeat(jax.lax.slice_in_dim(img, 0, 1, axis=axis), k, axis=axis),
                jax.lax.slice_in_dim(img, 0, img.shape[axis] - k, axis=axis),
            ],
            axis=axis,
        )
        out = out + (fwd + bwd) * wgt
    return out


def gaussian_blur(img: Array) -> Array:
    return _blur_axis(_blur_axis(img, 1), 0)


def apply_bloom(scene: Array, threshold: float, intensity: float) -> Array:
    """Full chain -> final (H, W, 3)."""
    h, w, _ = scene.shape
    half = downsample2x(scene)
    bloom = gaussian_blur(extract(half, threshold))
    return scene + upsample2x(bloom, h, w) * intensity
