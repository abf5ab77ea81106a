"""Tiled software rasterizer (pure XLA formulation).

Replaces the reference's hardware render pipelines (engine.ts:335-899): MSAA
4x coverage, per-sample depth with less-equal test, front/back/none culling,
draw-order-correct winner selection, and per-pixel barycentric G-buffer
output for deferred shading.

Design notes (TPU-first):
* The screen is split into ``tile x tile`` bins; each pass bins its triangles
  by bounding box (static capacity K) and a ``lax.scan`` walks the bin lists
  in chunks, updating a per-sample (depth, winner) carry. All shapes static.
* Edge functions and depth are affine in screen space, so each chunk step is
  pure VPU-friendly elementwise math: E = a*x + b*y + c.
* Instead of per-sample color, MSAA is resolved as *coverage fraction* of the
  winning fragment per pixel, folded into alpha at blend time; depth stays
  truly per-sample. (Per-vertex parity is exact; this only softens
  silhouette edges exactly where 4x MSAA would.)
* Rasterization is "closest fragment wins, then shade once per pixel".
  Within the reference's draw lists this matches the WebGPU output: opaque
  passes are order-independent, and the hair pass only lets the nearest
  fragment through thanks to its depth pre-pass (engine.ts:724-767).

A Pallas fused-tile kernel with the same semantics lives in
``reze_tpu/kernels/raster_tpu.py`` for the hot path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

# D3D/Vulkan standard 4x MSAA sample offsets from pixel center (engine.ts:72)
SAMPLE_OFFSETS = (
    (-2.0 / 16.0, -6.0 / 16.0),
    (6.0 / 16.0, -2.0 / 16.0),
    (-6.0 / 16.0, 2.0 / 16.0),
    (2.0 / 16.0, 6.0 / 16.0),
)

CULL_NONE = 0
CULL_FRONT = 1
CULL_BACK = 2

_INF = jnp.float32(jnp.inf)


class TriSetup(NamedTuple):
    """Screen-space triangle setup (all (T, ...))."""

    ea: Array  # (T, 3) edge a-coeff (x)
    eb: Array  # (T, 3) edge b-coeff (y)
    ec: Array  # (T, 3) edge c-coeff (const)
    z: Array  # (T, 3) corner NDC depth
    inv_w: Array  # (T, 3) corner 1/clip-w (for perspective-correct interp)
    inv_area2: Array  # (T,) 1 / (2*|area|)
    sx: Array  # (T, 3) screen x
    sy: Array  # (T, 3) screen y
    valid: Array  # (T,) bool


def project_corners(corners_world: Array, view_proj: Array) -> Array:
    """(T, 3, 3) world corners -> (T, 3, 4) clip coords."""
    ones = jnp.ones(corners_world.shape[:-1] + (1,), corners_world.dtype)
    hom = jnp.concatenate([corners_world, ones], axis=-1)
    return jnp.einsum("ij,tcj->tci", view_proj, hom)


def setup_triangles(
    corners_clip: Array, valid: Array, width: int, height: int, cull: int
) -> TriSetup:
    w = corners_clip[..., 3]
    ok = valid & jnp.all(w > 1e-6, axis=-1)
    safe_w = jnp.where(jnp.abs(w) > 1e-6, w, 1.0)
    inv_w = 1.0 / safe_w
    ndc = corners_clip[..., :3] * inv_w[..., None]
    sx = (ndc[..., 0] + 1.0) * (0.5 * width)
    sy = (1.0 - ndc[..., 1]) * (0.5 * height)
    z = ndc[..., 2]

    # signed screen area*2 (y-down): NDC-CCW ("front" under WebGPU default
    # winding) becomes negative here.
    area2 = (sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0]) - (
        sy[:, 1] - sy[:, 0]
    ) * (sx[:, 2] - sx[:, 0])
    is_front = area2 < 0.0
    if cull == CULL_FRONT:
        ok = ok & ~is_front
    elif cull == CULL_BACK:
        ok = ok & is_front
    ok = ok & (jnp.abs(area2) > 1e-12)

    # Raw edge functions below are positive inside when area2 < 0 (screen
    # y-down); normalize so inside is always E >= 0.
    orient = jnp.where(area2 < 0, 1.0, -1.0)

    # Edge k is opposite corner k: (v1,v2), (v2,v0), (v0,v1).
    ia = jnp.array([1, 2, 0])
    ib = jnp.array([2, 0, 1])
    ax_, ay_ = sx[:, ia], sy[:, ia]
    bx_, by_ = sx[:, ib], sy[:, ib]
    ea = (by_ - ay_) * orient[:, None]
    eb = (ax_ - bx_) * orient[:, None]
    ec = -(ea * ax_ + eb * ay_)
    inv_area2 = 1.0 / jnp.maximum(jnp.abs(area2), 1e-12)
    return TriSetup(ea, eb, ec, z, inv_w, inv_area2, sx, sy, ok)


def bin_triangles(
    tri: TriSetup, by: int, bx: int, tile: int, k: int
) -> Array:
    """Per-bin triangle id lists (B, K), padded with T (= invalid)."""
    t = tri.valid.shape[0]
    xmin = jnp.min(tri.sx, axis=1)
    xmax = jnp.max(tri.sx, axis=1)
    ymin = jnp.min(tri.sy, axis=1)
    ymax = jnp.max(tri.sy, axis=1)
    # conservative half-pixel pad for MSAA sample extents
    bx0 = jnp.floor((xmin - 0.5) / tile).astype(jnp.int32)
    bx1 = jnp.floor((xmax + 0.5) / tile).astype(jnp.int32)
    by0 = jnp.floor((ymin - 0.5) / tile).astype(jnp.int32)
    by1 = jnp.floor((ymax + 0.5) / tile).astype(jnp.int32)

    b = by * bx
    bin_ids = jnp.arange(b, dtype=jnp.int32)
    gx = (bin_ids % bx)[:, None]
    gy = (bin_ids // bx)[:, None]
    mask = (
        tri.valid[None, :]
        & (gx >= bx0[None, :])
        & (gx <= bx1[None, :])
        & (gy >= by0[None, :])
        & (gy <= by1[None, :])
    )
    key = jnp.where(mask, jnp.arange(t, dtype=jnp.int32)[None, :], t)
    lists = jnp.sort(key, axis=1)[:, :k]
    if lists.shape[1] < k:
        lists = jnp.pad(lists, ((0, 0), (0, k - lists.shape[1])), constant_values=t)
    return lists


class RasterOut(NamedTuple):
    zbuf: Array  # (B, S, th, tw) updated per-sample depth
    pix_tri: Array  # (B, th, tw) winning pass-local tri id, -1 = none
    pix_bary: Array  # (B, th, tw, 3) clamped barycentrics at pixel center
    cover: Array  # (B, th, tw) fraction of samples won by pix_tri
    win: Array  # (B, S, th, tw) per-sample winning tri id (true MSAA resolve)


def rasterize_pass(
    tri: TriSetup,
    bins: Array,  # (B, K) triangle id lists
    zbuf: Array,  # (B, S, th, tw)
    *,
    tile: int,
    bx: int,
    depth_write: bool,
    chunk: int = 4,
) -> RasterOut:
    b, s = zbuf.shape[0], zbuf.shape[1]
    th = tw = tile
    t = tri.valid.shape[0]
    k = bins.shape[1]
    n_chunks = -(-k // chunk)
    if n_chunks * chunk > k:
        bins = jnp.pad(bins, ((0, 0), (0, n_chunks * chunk - k)), constant_values=t)

    # pad triangle tables with one dead entry at index T
    def pad(a):
        pad_width = [(0, 1)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad_width)

    ea, eb, ec = pad(tri.ea), pad(tri.eb), pad(tri.ec)
    zc = pad(tri.z)
    inv_area2 = pad(tri.inv_area2)
    tvalid = jnp.pad(tri.valid, (0, 1))  # index T -> False

    # per-bin pixel center coordinates
    bin_ids = jnp.arange(b, dtype=jnp.int32)
    ox = ((bin_ids % bx) * tile).astype(jnp.float32)
    oy = ((bin_ids // bx) * tile).astype(jnp.float32)
    col = jnp.arange(tw, dtype=jnp.float32) + 0.5
    row = jnp.arange(th, dtype=jnp.float32) + 0.5
    gx = ox[:, None, None] + col[None, None, :]  # (B, 1, tw)
    gy = oy[:, None, None] + row[None, :, None]  # (B, th, 1)
    gx = jnp.broadcast_to(gx, (b, th, tw))
    gy = jnp.broadcast_to(gy, (b, th, tw))

    offs = jnp.asarray(SAMPLE_OFFSETS[:s])  # (S, 2)

    def step(carry, ids):  # ids: (B, chunk)
        zb, win = carry
        a3 = ea[ids]  # (B, c, 3)
        b3 = eb[ids]
        c3 = ec[ids]
        z3 = zc[ids]
        ia2 = inv_area2[ids]
        ok = tvalid[ids]  # (B, c)

        # edge values at pixel centers: (B, c, th, tw) per edge
        def edge(kk):
            return (
                a3[..., kk, None, None] * gx[:, None]
                + b3[..., kk, None, None] * gy[:, None]
                + c3[..., kk, None, None]
            )

        e0, e1, e2 = edge(0), edge(1), edge(2)

        zmin_new = jnp.full((b, s, th, tw), jnp.inf)
        winner_new = jnp.full((b, s, th, tw), -1, jnp.int32)
        for si in range(s):
            dx, dy = offs[si, 0], offs[si, 1]
            e0s = e0 + (a3[..., 0, None, None] * dx + b3[..., 0, None, None] * dy)
            e1s = e1 + (a3[..., 1, None, None] * dx + b3[..., 1, None, None] * dy)
            e2s = e2 + (a3[..., 2, None, None] * dx + b3[..., 2, None, None] * dy)
            inside = (e0s >= 0) & (e1s >= 0) & (e2s >= 0)
            zs = (e0s * z3[..., 0, None, None] + e1s * z3[..., 1, None, None] + e2s * z3[..., 2, None, None]) * ia2[..., None, None]
            passed = (
                inside
                & ok[..., None, None]
                & (zs <= zb[:, si, None])
                & (zs >= 0.0)
                & (zs <= 1.0)
            )
            zs_m = jnp.where(passed, zs, jnp.inf)
            if depth_write:
                zmin = jnp.min(zs_m, axis=1)  # (B, th, tw)
                tie = passed & (zs_m <= zmin[:, None] + 0.0)
                wsel = jnp.where(tie, ids[..., None, None], -1)
                winner = jnp.max(wsel, axis=1)
            else:
                # draw order wins among all passing (no depth feedback)
                zmin = jnp.full((b, th, tw), jnp.inf)
                wsel = jnp.where(passed, ids[..., None, None], -1)
                winner = jnp.max(wsel, axis=1)
                zmin = jnp.where(winner >= 0, jnp.min(zs_m, axis=1), jnp.inf)
            zmin_new = zmin_new.at[:, si].set(zmin)
            winner_new = winner_new.at[:, si].set(winner)

        got = winner_new >= 0
        win = jnp.where(got, winner_new, win)
        if depth_write:
            zb = jnp.minimum(zb, zmin_new)
        return (zb, win), None

    ids_seq = bins[:, : n_chunks * chunk].reshape(b, n_chunks, chunk).transpose(1, 0, 2)
    win0 = jnp.full((b, s, th, tw), -1, jnp.int32)
    (zbuf_out, win), _ = jax.lax.scan(step, (zbuf, win0), ids_seq)

    # per-pixel winner = latest-drawn fragment among sample winners; coverage
    # counts samples won by ANY fragment of this pass (interior edges where
    # two triangles split the samples must stay fully covered, like real
    # MSAA resolving two shaded fragments)
    pix_tri = jnp.max(win, axis=1)  # (B, th, tw)
    cover = jnp.mean((win >= 0).astype(jnp.float32), axis=1)

    # recompute barycentrics at pixel centers for the winner
    safe = jnp.maximum(pix_tri, 0)
    a3 = ea[safe]  # (B, th, tw, 3)
    b3 = eb[safe]
    c3 = ec[safe]
    ia2 = inv_area2[safe]
    e = a3 * gx[..., None] + b3 * gy[..., None] + c3
    bary = e * ia2[..., None]
    bary = jnp.clip(bary, 0.0, 1.0)
    bary = bary / jnp.maximum(jnp.sum(bary, axis=-1, keepdims=True), 1e-8)

    return RasterOut(zbuf_out, pix_tri, bary, cover, win)


# ---------------------------------------------------------------------------
# Tiled layout helpers
# ---------------------------------------------------------------------------


def tiles_to_image(x: Array, by: int, bx: int, tile: int) -> Array:
    """(B, th, tw, ...) -> (H, W, ...)."""
    rest = x.shape[3:]
    return (
        x.reshape((by, bx, tile, tile) + rest)
        .swapaxes(1, 2)
        .reshape((by * tile, bx * tile) + rest)
    )


def image_to_tiles(x: Array, by: int, bx: int, tile: int) -> Array:
    rest = x.shape[2:]
    return (
        x.reshape((by, tile, bx, tile) + rest)
        .swapaxes(1, 2)
        .reshape((by * bx, tile, tile) + rest)
    )
