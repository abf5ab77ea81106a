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


def _up2_axis(img: Array, axis: int) -> Array:
    """Exact 2x bilinear upsample along one axis with elementwise ops only
    (jax.image.resize lowers to gathers — ~10 ns/idx on TPU; this is pure
    shifts + lerps). align_corners=False grid: out[2i] = .75 x[i] + .25
    x[i-1], out[2i+1] = .75 x[i] + .25 x[i+1], clamp-to-edge."""
    n = img.shape[axis]
    first = jax.lax.slice_in_dim(img, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(img, n - 1, n, axis=axis)
    prev = jnp.concatenate([first, jax.lax.slice_in_dim(img, 0, n - 1, axis=axis)], axis=axis)
    nxt = jnp.concatenate([jax.lax.slice_in_dim(img, 1, n, axis=axis), last], axis=axis)
    even = img * 0.75 + prev * 0.25
    odd = img * 0.75 + nxt * 0.25
    out = jnp.stack([even, odd], axis=axis + 1)
    return out.reshape(img.shape[:axis] + (2 * n,) + img.shape[axis + 1:])


def upsample2x(img: Array, out_h: int, out_w: int) -> Array:
    """Bilinear 2x upsample to (out_h, out_w, C)."""
    if out_h == 2 * img.shape[0] and out_w == 2 * img.shape[1]:
        return _up2_axis(_up2_axis(img, 0), 1)
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


# ---------------------------------------------------------------------------
# Channel-first variants: (3, H, W) keeps the lane dimension full (W), while
# (H, W, 3) wastes 125/128 lanes on TPU — measured 4.9 ms vs ~0.4 ms for the
# same bloom chain at 1080p.
# ---------------------------------------------------------------------------


def downsample2x_cf(img: Array) -> Array:
    """(C, H, W) -> (C, H//2, W//2) box filter."""
    c, h, w = img.shape
    return img[:, : h // 2 * 2, : w // 2 * 2].reshape(c, h // 2, 2, w // 2, 2).mean((2, 4))


def _up2_axis_cf(img: Array, axis: int) -> Array:
    n = img.shape[axis]
    first = jax.lax.slice_in_dim(img, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(img, n - 1, n, axis=axis)
    prev = jnp.concatenate([first, jax.lax.slice_in_dim(img, 0, n - 1, axis=axis)], axis=axis)
    nxt = jnp.concatenate([jax.lax.slice_in_dim(img, 1, n, axis=axis), last], axis=axis)
    even = img * 0.75 + prev * 0.25
    odd = img * 0.75 + nxt * 0.25
    out = jnp.stack([even, odd], axis=axis + 1)
    return out.reshape(img.shape[:axis] + (2 * n,) + img.shape[axis + 1:])


def apply_bloom_cf(scene: Array, threshold: float, intensity: float) -> Array:
    """(3, H, W) bloom chain, channel-first."""
    half = downsample2x_cf(scene)
    bloom = _blur_axis(_blur_axis(extract(half, threshold), 2), 1)
    return scene + _up2_axis_cf(_up2_axis_cf(bloom, 1), 2) * intensity
