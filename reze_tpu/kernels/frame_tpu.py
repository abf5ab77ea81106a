"""The frame megakernel: all raster passes + layer stack + shading in ONE
pallas_call.

Round-2 profiling showed the per-pass architecture loses most of its time
outside the actual rasterization: 13 kernel launches with XLA glue between
them (zbuf copies, G-buffer merges, push selects — ~25 ms/frame at 1080p of
pure HBM traffic), plus a scalar-walk inner loop that pays ~100 ns of scalar
reads per (bin, triangle) pair. This kernel restructures the whole frame
TPU-first:

* one grid step per (32, 128) tile; depth buffer, 2-layer fragment stack and
  stencil stay **VMEM-resident across all 7 passes** — zero inter-pass HBM
  traffic;
* triangle data arrives as **pair-ordered rows** ((bin,tri) pairs sorted by
  (pass, bin, ymin-row, draw id), gathered XLA-side): each tile DMAs its
  contiguous segment from HBM in double-buffered chunks — no indirection and
  no scalar id reads in the kernel;
* **groups of 8 pairs process on sublanes**: per tile row, all 8 triangles'
  edge/depth planes evaluate as (8, 128) vector ops and reduce across
  sublanes (min-z winner with draw-order ties), replacing the scalar-walk's
  per-triangle scalar extracts. The ymin-row sort bounds each group's row
  span;
* the per-pass epilogue pushes the pass's fragments onto the stack (the
  same 2-layer semantics as render/pipeline_tpu.push) and the eye/hair
  stencil rules run as tile-local selects (engine.ts:610-899);
* after the last pass the tile is shaded in place (kernels/shade_tpu
  lighting) and a (16, 32, 128) output block is written: per layer lit rgb,
  rim, texel index + bilinear footprint, a_eff.

The albedo texture fetch (the TPU's slowest primitive at ~10 ns/index)
stays outside in XLA, fed by the emitted texel indices.

Reference parity: pass ordering and fixed-function state of
engine.ts:2123-2243 (less-equal depth, draw-order ties, per-pass cull
applied at setup, 4x MSAA per-sample depth with coverage-to-alpha).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..render.raster import SAMPLE_OFFSETS, TriSetup
from . import shade_tpu as ST

TILE_H = 8  # one vreg row: every tile row is statically addressed
TILE_W = 128
# debug knobs for kernel-cost attribution (scripts/profile_mega2.py)
DEBUG_DEPTH_ONLY = False
DEBUG_NO_WINNER_GATE = False
CHUNK = 128  # pairs per DMA chunk (x128 f32 row = 64 KB)
# pairs per sublane group. Bigger groups amortize the winner/update ops
# (reduces + (1,128) gbuf selects) over more pairs at the cost of coarser
# tail masking. On-chip sweep at 1080p msaa4 (scripts/mb_group.py,
# 139,644 pairs / 1,697 segments): 8 -> 11.41 ms, 16 -> 9.67, 32 -> 9.33
# (winner), 64 -> 9.93 (tail waste), 128 -> 70.8 (vreg spill).
GROUP = int(os.environ.get("RZ_GROUP", "32"))
# y-band row loop: pairs are ymin-row sorted, so a group's triangles span
# a narrow band of the 8 tile rows; a dynamic fori_loop over just that
# band replaces the static 8-row unroll. MEASURED NEGATIVE on-chip
# (mb_group.py: 2-3x SLOWER at every group size — dynamic-bound loops +
# dynamic sublane slices cost far more than the rows they skip). Kept off;
# the flag remains for re-measurement on future toolchains.
YBAND = os.environ.get("RZ_YBAND", "0") == "1"
ROW_W = 128  # f32 lanes per pair row (HBM DMA slices must be 128-aligned)

# pair-row column layout
# 0:9   ea0 eb0 ec0 ea1 eb1 ec1 ea2 eb2 ec2   (edge planes, pre-divided)
# 9:12  za zb zc                              (depth plane)
# 12:14 ymin ymax                             (pixel-space y range)
# 14    packed material code [alpha|ramp|tex|edge|hair]
# 15:18 1/|grad e_i| (analytic-coverage AA)
# 19:37 a0..a5 b0..b5 c0..c5                  (attribute planes)
# 64:96 hybrid-kernel coefficient blocks, 8-aligned for the in-kernel
#       (128, 32) transpose (kernels/frame_hybrid.py): [sea_i seb_i sec_i]
#       = edge plane i scaled by 1/|grad| at 64/72/80, [za zb zc] at 88
C_E = 0
C_Z = 9
C_YMIN = 12
C_YMAX = 13
C_ALPHA = 14
C_IGRAD = 15
C_ATTR = 19
C_HYB = 64

# per-pass static config: (outline, depth_write, write_stencil, use_stencil)
PASS_CFG = (
    (False, True, False, False),  # opaque
    (False, True, True, False),  # eyes (stencil := 1)
    (True, True, False, False),  # opaque outlines
    (False, True, False, True),  # hair (stencil-split alpha)
    (True, False, False, False),  # hair outlines (no depth write)
    (False, True, False, False),  # transparent
    (True, True, False, False),  # transparent outlines
)
N_PASSES = len(PASS_CFG)

# pass-gbuf scratch channels. There is no coverage channel: G_Z is reset
# to 2.0 per pass and any winner write leaves it < 2.0, so "this pixel has
# a fragment" is G_Z < 2.0 — saves a select + store per (group, row)
G_UIW, G_VIW, G_NXIW, G_NYIW, G_NZIW, G_IW, G_Z, G_ALPHA, G_HAIR, G_RAMP, \
    G_TEX, G_EDGE = range(12)
G_CH = 12


class FrameTables(NamedTuple):
    rows: jax.Array  # (CAP + CHUNK, ROW_W) f32 pair rows, pass-major
    rows_t: jax.Array | None  # (ROW_W, CAP + CHUNK) transposed copy (MXU path)
    starts: jax.Array  # (N_PASSES, B) i32 into rows
    counts: jax.Array  # (N_PASSES, B) i32
    overflow: jax.Array  # () i32 total dropped pairs


def pack_pass_part(
    tri: TriSetup,
    corner_uv: jax.Array,
    corner_nrm: jax.Array,
    alpha: jax.Array,
    is_hair: jax.Array,
    ramp_gid: jax.Array,
    tex_gid: jax.Array,
    edge_gid: jax.Array,
    by: int,
    bx: int,
    cap: int,
    with_attrs: bool,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """One pass -> (tab (T, ROW_W), bin_id (cap,), ok, tri_of_k, total):
    the triangle row table + exact pair enumeration, unsorted — feed
    pack_frame_rows to merge all passes under ONE sort + ONE row gather."""
    t = tri.valid.shape[0]
    inv2a = tri.inv_area2[:, None]

    za = jnp.sum(tri.ea * tri.z, axis=1) * inv2a[:, 0]
    zb = jnp.sum(tri.eb * tri.z, axis=1) * inv2a[:, 0]
    zc = jnp.sum(tri.ec * tri.z, axis=1) * inv2a[:, 0]

    big = jnp.float32(1e9)
    xmin = jnp.where(tri.valid, jnp.min(tri.sx, axis=1), big)
    xmax = jnp.where(tri.valid, jnp.max(tri.sx, axis=1), -big)
    ymin = jnp.where(tri.valid, jnp.min(tri.sy, axis=1), big)
    ymax = jnp.where(tri.valid, jnp.max(tri.sy, axis=1), -big)

    ea = tri.ea * inv2a
    eb = tri.eb * inv2a
    ec = tri.ec * inv2a

    # pack the 5 per-material scalars into ONE f32 code (23 bits, exact):
    # [alpha*1023 | ramp<4b> | tex<4b> | edge<4b> | hair<1b>] — the winner
    # resolve then needs a single masked reduce instead of five
    code = (jnp.round(jnp.clip(alpha, 0.0, 1.0) * 1023.0)
            + 1024.0 * (ramp_gid + 16.0 * tex_gid + 256.0 * edge_gid
                        + 4096.0 * is_hair.astype(jnp.float32)))
    zero = jnp.zeros_like(code)
    # inverse edge-gradient magnitudes (1/|∇e_i| in pixels) for the
    # analytic-coverage AA mode: coverage_i = clamp(0.5 + e_i * ig_i, 0, 1)
    ig = jax.lax.rsqrt(jnp.maximum(ea * ea + eb * eb, 1e-24))  # (T, 3)
    cols = [
        ea[:, 0], eb[:, 0], ec[:, 0],
        ea[:, 1], eb[:, 1], ec[:, 1],
        ea[:, 2], eb[:, 2], ec[:, 2],
        za, zb, zc, ymin, ymax,
        code, ig[:, 0], ig[:, 1], ig[:, 2], zero,
    ]
    if with_attrs:
        iw = tri.inv_w
        vals = jnp.concatenate(
            [corner_uv * iw[..., None], corner_nrm * iw[..., None], iw[..., None]],
            axis=-1,
        )  # (T, 3, 6)
        a_ch = jnp.einsum("tk,tkc->tc", ea, vals)
        b_ch = jnp.einsum("tk,tkc->tc", eb, vals)
        c_ch = jnp.einsum("tk,tkc->tc", ec, vals)
        attr = jnp.concatenate([a_ch, b_ch, c_ch], axis=1)  # (T, 18)
    else:
        attr = jnp.zeros((t, 18))
    tab = jnp.stack(cols, axis=1)  # (T, 19)
    # hybrid-kernel blocks (cols 64:96): scaled edge planes + depth plane
    # in 8-aligned triples so the in-kernel (128, 32) transpose yields the
    # (8, 512) quad by four aligned sublane slices (frame_hybrid.py)
    hyb = []
    for i in range(3):
        hyb += [ea[:, i] * ig[:, i], eb[:, i] * ig[:, i],
                ec[:, i] * ig[:, i], zero, zero, zero, zero, zero]
    hyb += [za, zb, zc]
    tab = jnp.concatenate(
        [tab, attr, jnp.zeros((t, C_HYB - 37)), jnp.stack(hyb, axis=1),
         jnp.zeros((t, ROW_W - C_HYB - 27))], axis=1)

    # exact (bin, tri) pair enumeration, sorted by (bin, ymin-row, id) so a
    # sublane group's triangles share a narrow row band
    bx0 = jnp.clip(jnp.floor((xmin - 0.5) / TILE_W), 0, bx - 1).astype(jnp.int32)
    bx1 = jnp.clip(jnp.floor((xmax + 0.5) / TILE_W), 0, bx - 1).astype(jnp.int32)
    by0 = jnp.clip(jnp.floor((ymin - 0.5) / TILE_H), 0, by - 1).astype(jnp.int32)
    by1 = jnp.clip(jnp.floor((ymax + 0.5) / TILE_H), 0, by - 1).astype(jnp.int32)
    nx = bx1 - bx0 + 1
    live = tri.valid & (xmax >= xmin)
    n_bins_tri = jnp.where(live, nx * (by1 - by0 + 1), 0)

    ends_tri = jnp.cumsum(n_bins_tri)
    starts_tri = ends_tri - n_bins_tri
    total = ends_tri[-1]
    k = jnp.arange(cap, dtype=jnp.int32)
    # run-length expansion via scatter-marks + cumsum, NOT searchsorted:
    # monotone-query searchsorted lowers to ~log2(t) serialized gather
    # rounds over (cap,) (measured 26.5 ms of the 32 ms 1080p pack across
    # the 7 passes); the scatter+cumsum form is O(cap) vector work
    marks = jnp.zeros((cap,), jnp.int32).at[starts_tri].add(
        1, mode="drop", indices_are_sorted=True)
    tri_of_k = jnp.clip(jnp.cumsum(marks) - 1, 0, t - 1)
    # ONE (cap, 4) row gather instead of 4 scalar gathers (gather cost is
    # per-index, not per-element — see frame_stream.build_pass_rows)
    enum_tab = jnp.stack([starts_tri, nx, by0, bx0], axis=1)  # (t, 4) i32
    vals = enum_tab[tri_of_k]
    slot = k - vals[:, 0]
    ok = k < total
    nx_k = jnp.maximum(vals[:, 1], 1)
    # slot // nx via f32 reciprocal: vector int32 division has no hardware
    # path on the VPU. Exact because slot <= bins-per-tri < 2^12 and the
    # +0.25 bias dominates the reciprocal rounding (err <= slot * 2^-24).
    sy = jnp.floor((slot.astype(jnp.float32) + 0.25)
                   * (1.0 / nx_k.astype(jnp.float32))).astype(jnp.int32)
    bin_y = vals[:, 2] + sy
    bin_id = bin_y * bx + (vals[:, 3] + (slot - sy * nx_k))
    return tab, bin_id, ok, tri_of_k, total


def pack_frame_rows(parts, by: int, bx: int) -> "FrameTables":
    """Merge all passes' pair enumerations under ONE sort + ONE row gather.

    ``parts``: per pass, pack_pass_part's (tab, bin_id, ok, tri_of_k,
    total). Key = ((pass * B + bin) << 15) | (tri + 1) — pass-major then
    bin-major, so starts/counts reshape directly to the (N_PASSES, B)
    layout the megakernel reads and every (pass, bin) segment holds
    exactly the rows the per-pass sort produced, in the same order.
    Replaces 7 sorts + 7 gathers + a full-size rows concatenation.

    Per-segment starts/counts come from SEGMENT MARKERS riding the same
    sort: one marker key per (pass, bin) with tri-field 0 (pairs carry
    tri + 1) plus a terminator sorts each marker immediately before its
    segment's pairs, so starts[s] = pos(marker s) + 1 and counts[s] =
    pos(marker s+1) - pos(marker s) - 1. Extracting the positions is a
    second (key, iota) sort — the scatter-add histogram this replaces
    measured 2.5 ms at 272k pairs vs ~0.3 ms per sort (r4 microbench)."""
    assert len(parts) == N_PASSES
    b_total = by * bx
    nseg = N_PASSES * b_total
    # key packing fits int32 up to b_total < 9362 (4K is 8100)
    assert nseg < (1 << 16), b_total
    keys = []
    offs = []
    off = 0
    overflow = jnp.int32(0)
    for p, (tab, bin_id, ok, tri_of_k, total) in enumerate(parts):
        assert tab.shape[0] < (1 << 15) - 1  # tri + 1 must fit 15 bits
        keys.append(jnp.where(
            ok, ((p * b_total + bin_id) << 15) + tri_of_k + 1,
            jnp.int32((nseg << 15) + 1)))
        offs.append(off)
        off += tab.shape[0]
        overflow = overflow + jnp.maximum(total - ok.shape[0], 0)
    markers = jnp.arange(nseg + 1, dtype=jnp.int32) << 15
    key = jnp.sort(jnp.concatenate(keys + [markers]))
    n = key.shape[0]  # cap + nseg + 1
    tri_f = key & ((1 << 15) - 1)
    sk = key >> 15  # pass * B + bin, sorted
    is_marker = tri_f == 0
    is_pair = jnp.logical_not(is_marker) & (sk < nseg)
    # markers and dead pairs gather the appended zero row (no masking pass
    # over the (n, ROW_W) result needed)
    tab_all = jnp.concatenate(
        [pp[0] for pp in parts] + [jnp.zeros((1, ROW_W))])
    pass_of = jnp.where(is_pair, sk // b_total, 0)
    row_idx = jnp.where(
        is_pair, jnp.asarray(offs, jnp.int32)[pass_of] + tri_f - 1,
        tab_all.shape[0] - 1)
    rows = tab_all[row_idx]
    mkey = jnp.where(is_marker, sk, jnp.int32(1 << 30))
    _, mpos = jax.lax.sort(
        (mkey, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    p_s = mpos[: nseg + 1]  # position of marker s in the merged stream
    starts = p_s[:-1] + 1
    counts = p_s[1:] - p_s[:-1] - 1
    # pad to a CHUNK multiple (+ one spare chunk): DMA windows and the mxu
    # path's CHUNK-strided quad-table reshape both need it
    pad = CHUNK + (-n) % CHUNK
    rows_all = jnp.concatenate([rows, jnp.zeros((pad, ROW_W))])
    return FrameTables(
        rows=rows_all,
        rows_t=None,
        starts=starts.reshape(N_PASSES, b_total),
        counts=counts.reshape(N_PASSES, b_total),
        overflow=overflow,
    )


def _process_group(
    buf_ref, g, base_left, x0f, y0f, xs8, s_iota, zbuf_ref, gbuf_ref, won_ref,
    *, n_samples, depth_write, with_attrs, analytic=False,
    group=8, yband=False,
):
    """Rasterize one group of 8 pairs (sublane = pair) into the (8, 128)
    tile. All 8 rows are statically addressed vreg ops.

    ``analytic``: ONE center depth test; fractional pixel coverage from the
    exact signed edge distances (clamp(0.5 + e_i/|grad e_i|, 0, 1) product)
    instead of the n-sample loop. Depth writes stay center-gated so the AA
    halo never occludes background geometry.
    """
    rows = buf_ref[pl.ds(g * group, group), :]  # (group, ROW_W)
    valid = s_iota < base_left  # (GROUP, 1): pairs beyond the segment off

    def col(i):
        return rows[:, i:i + 1]  # (GROUP, 1)

    ea0, eb0, ec0 = col(0), col(1), col(2)
    ea1, eb1, ec1 = col(3), col(4), col(5)
    ea2, eb2, ec2 = col(6), col(7), col(8)
    za, zb, zc = col(9), col(10), col(11)
    # fold the tile origin into the plane constants ((GROUP,1) scalar FMAs):
    # evaluating at tile-local coordinates keeps the f32 rounding constant
    # per tile, so z-ties on near-coplanar geometry resolve consistently
    # (the global formulation flips them in pixel-row bands at 1080p)
    ec0 = ec0 + ea0 * x0f + eb0 * y0f
    ec1 = ec1 + ea1 * x0f + eb1 * y0f
    ec2 = ec2 + ea2 * x0f + eb2 * y0f
    zc = zc + za * x0f + zb * y0f

    # x-parts of the edge/depth planes (reused across rows)
    ex0 = ea0 * xs8 + ec0  # (GROUP, 128)
    ex1 = ea1 * xs8 + ec1
    ex2 = ea2 * xs8 + ec2
    zx = za * xs8 + zc

    # per-sample plane offsets (GROUP, 1)
    offs = []
    if not analytic:
        for s in range(n_samples):
            dx, dy = SAMPLE_OFFSETS[s]
            offs.append((ea0 * dx + eb0 * dy, ea1 * dx + eb1 * dy,
                         ea2 * dx + eb2 * dy, za * dx + zb * dy))
    else:
        ig0 = col(C_IGRAD)
        ig1 = col(C_IGRAD + 1)
        ig2 = col(C_IGRAD + 2)

    if with_attrs:
        acols = []
        for ch in range(6):
            a = col(C_ATTR + ch)
            bb = col(C_ATTR + 6 + ch)
            cc = col(C_ATTR + 12 + ch) + a * x0f + bb * y0f
            # hoist the row-invariant x part: per row the attribute plane
            # is axc + bb*ys — one FMA instead of two
            acols.append((a * xs8 + cc, bb))
    code_col = col(C_ALPHA)

    def winner(idx, ys, zz, any_pass):
        zmask = jnp.where(any_pass, zz, 2.0)
        zmin = jnp.min(zmask, axis=0, keepdims=True)  # (1, 128)
        # winner: latest-drawn pair at min z (draw-order ties)
        cand = jnp.where(zmask == zmin, s_iota, -1.0)
        win = jnp.max(cand, axis=0, keepdims=True)
        mask = (s_iota == win) & any_pass  # one-hot over sublanes
        maskf = mask.astype(jnp.float32)
        cur_z = gbuf_ref[G_Z, idx, :]
        # G_Z resets to 2.0 per pass, so zmin < 2.0 implies "real fragment"
        # and beats the reset value — no separate coverage channel needed
        upd = (zmin <= cur_z) & (zmin < 2.0)

        def msum(vals):
            return jnp.sum(maskf * vals, axis=0, keepdims=True)

        def put(ch, val):
            gbuf_ref[ch, idx, :] = jnp.where(upd, val, gbuf_ref[ch, idx, :])

        put(G_Z, zmin)
        put(G_ALPHA, msum(code_col))
        if with_attrs:
            for ch in range(6):
                axc, bb = acols[ch]
                put(G_UIW + ch, msum(axc + bb * ys))

    def row_body(y):
        idx = pl.ds(y, 1)
        ys = (y * 1.0 if isinstance(y, int)
              else y.astype(jnp.float32)) + 0.5  # tile-local
        e0 = ex0 + eb0 * ys
        e1 = ex1 + eb1 * ys
        e2 = ex2 + eb2 * ys
        zz = zx + zb * ys
        any_pass = None
        if analytic:
            cov = (jnp.clip(e0 * ig0 + 0.5, 0.0, 1.0)
                   * jnp.clip(e1 * ig1 + 0.5, 0.0, 1.0)
                   * jnp.clip(e2 * ig2 + 0.5, 0.0, 1.0))
            zrow = zbuf_ref[0, idx, :]
            # no z <= 1 test: zrow <= 1 is a kernel invariant (init 1.0,
            # min-writes only), so z <= zrow subsumes it
            zok = (zz <= zrow) & (zz >= 0.0)
            any_pass = (cov > 0.0) & valid & zok
            # depth: center-covered fragments only (min-tree folds the
            # three edge tests and the near-plane test into one compare)
            mn = jnp.minimum(jnp.minimum(e0, e1), jnp.minimum(e2, zz))
            center = (mn >= 0) & (zz <= zrow) & valid
            zmin_c = jnp.min(jnp.where(center, zz, 2.0), axis=0,
                             keepdims=True)
            if depth_write:
                zbuf_ref[0, idx, :] = jnp.minimum(zrow, zmin_c)
            won_ref[0, idx, :] = jnp.maximum(
                won_ref[0, idx, :],
                jnp.max(jnp.where(any_pass, cov, 0.0), axis=0,
                        keepdims=True),
            )
        else:
            for s in range(n_samples):
                o0, o1, o2, oz = offs[s]
                zs = zz + oz
                zrow = zbuf_ref[s, idx, :]  # (1, 128)
                # min-tree: all three edges >= 0 AND zs >= 0 in one compare;
                # zs <= 1 is subsumed by zs <= zrow (zrow <= 1 invariant)
                mn = jnp.minimum(jnp.minimum(e0 + o0, e1 + o1),
                                 jnp.minimum(e2 + o2, zs))
                passed = (mn >= 0) & (zs <= zrow) & valid
                zmin_s = jnp.min(jnp.where(passed, zs, 2.0), axis=0, keepdims=True)
                if depth_write:
                    zbuf_ref[s, idx, :] = jnp.minimum(zrow, zmin_s)
                won_ref[s, idx, :] = jnp.maximum(
                    won_ref[s, idx, :],
                    jnp.max(passed.astype(jnp.float32), axis=0, keepdims=True),
                )
                any_pass = passed if any_pass is None else (any_pass | passed)

        if not DEBUG_DEPTH_ONLY:
            # unconditional: a per-row pl.when gate (scalar reduce + branch)
            # costs more than the winner body it would skip
            winner(idx, ys, zz, any_pass)

    if yband:
        # pairs are (bin, ymin-row, id)-sorted, so the group's triangles
        # span a narrow row band: loop only [r0, r1]. Bounds are
        # conservative for both modes (sample offsets <= 0.375 px; the
        # analytic halo reaches 0.5 px past an edge).
        big = jnp.float32(1e9)
        y0g = jnp.min(jnp.where(valid, col(C_YMIN), big))
        y1g = jnp.max(jnp.where(valid, col(C_YMAX), -big))
        r0 = jnp.clip(jnp.floor(y0g - y0f).astype(jnp.int32) - 1,
                      0, TILE_H - 1)
        r1 = jnp.clip(jnp.floor(y1g - y0f).astype(jnp.int32) + 1,
                      0, TILE_H - 1)
        jax.lax.fori_loop(r0, r1 + 1,
                          lambda y, c: (row_body(y), c)[1], 0)
    else:
        for y in range(TILE_H):
            row_body(y)


def _push_pass(
    stack_ref, stencil_ref, gbuf_ref, won_ref,
    *, outline, write_stencil, use_stencil, n_samples,
):
    """Push the pass's fragments onto the 2-layer stack (VMEM selects)."""
    cover = jnp.zeros((TILE_H, TILE_W))
    for s in range(n_samples):
        cover = cover + won_ref[s]
    cover = cover * (1.0 / n_samples)
    hit = gbuf_ref[G_Z] < 2.0  # G_Z resets to 2.0; winners write < 2.0

    # decode the packed material code:
    # [alpha*1023 | ramp<4b> | tex<4b> | edge<4b> | hair<1b>]
    code = jnp.round(gbuf_ref[G_ALPHA]).astype(jnp.int32)
    a = (code & 1023).astype(jnp.float32) * (1.0 / 1023.0)
    rest = code >> 10
    ramp_g = (rest & 15).astype(jnp.float32)
    tex_g = ((rest >> 4) & 15).astype(jnp.float32)
    edge_g = ((rest >> 8) & 15).astype(jnp.float32)
    hair_g = ((rest >> 12) & 1).astype(jnp.float32)
    if use_stencil:
        a = a * jnp.where((stencil_ref[0] > 0.5) & (hair_g > 0.5),
                          0.5, 1.0)
    a_eff = a * cover
    present = hit & (a_eff >= 0.001)
    a_eff = jnp.where(present, a_eff, 0.0)
    opaque = present & (a_eff > 0.999)
    translucent = present & ~opaque

    l1_aeff = stack_ref[ST.L_CH + ST.L_AEFF]
    l1p = l1_aeff > 0.0
    displace = translucent & l1p
    for ch in range(ST.L_CH):
        l0 = stack_ref[ch]
        l1 = stack_ref[ST.L_CH + ch]
        stack_ref[ch] = jnp.where(opaque, 0.0, jnp.where(displace, l1, l0))

    frag = {
        ST.L_UIW: gbuf_ref[G_UIW], ST.L_VIW: gbuf_ref[G_VIW],
        ST.L_NXIW: gbuf_ref[G_NXIW], ST.L_NYIW: gbuf_ref[G_NYIW],
        ST.L_NZIW: gbuf_ref[G_NZIW], ST.L_IW: gbuf_ref[G_IW],
        ST.L_Z: gbuf_ref[G_Z], ST.L_AEFF: a_eff,
        ST.L_OUT: jnp.full((TILE_H, TILE_W), 1.0 if outline else 0.0),
        ST.L_RAMP: ramp_g, ST.L_TEX: tex_g, ST.L_EDGE: edge_g,
    }
    for ch in range(ST.L_CH):
        l1 = stack_ref[ST.L_CH + ch]
        stack_ref[ST.L_CH + ch] = jnp.where(present, frag[ch], l1)

    if write_stencil:
        stencil_ref[0] = jnp.where(hit & (cover > 0.0), 1.0, stencil_ref[0])


def _frame_kernel(
    starts_ref, counts_ref,  # SMEM (1, N_PASSES, B) block (per char batched)
    rows_hbm,  # ANY (CAP + CHUNK, ROW_W); leading C axis when batched
    knot_ref, tex_ref, edge_ref, ldir_ref, lcol_ref, misc_ref, inv_vp_ref,
    out_ref,  # (2*O_CH, 32, 128) block
    zbuf_ref, gbuf_ref, stack_ref, stencil_ref, won_ref,  # scratch
    buf_ref, sem_ref,  # DMA scratch: (2, CHUNK, ROW_W) + 2 sems
    pf_ref,  # SMEM (1,) i32: next pass's first chunk already in flight
    *,
    bx: int, wp: int, hp: int, n_samples: int, kr: int, kt: int, ke: int,
    n_levels: int, batched: bool = False, analytic: bool = False,
    group: int = GROUP, yband: bool = YBAND,
):
    if batched:
        # grid (C, by, bx): one character per leading grid step; misc and
        # inv_vp arrive as per-character blocks
        c = pl.program_id(0)
        bi = pl.program_id(1)
        bj = pl.program_id(2)
        rows_hbm = rows_hbm.at[c]
        misc_ref = misc_ref.at[0]  # (1, 1, 8) block -> (1, 8)
        inv_vp_ref = inv_vp_ref.at[0]
        out_ref = out_ref.at[0]
    else:
        bi = pl.program_id(0)
        bj = pl.program_id(1)
    b = bi * bx + bj
    x0f = (bj * TILE_W).astype(jnp.float32)
    y0f = (bi * TILE_H).astype(jnp.float32)

    zbuf_ref[...] = jnp.ones_like(zbuf_ref)
    stack_ref[...] = jnp.zeros_like(stack_ref)
    stencil_ref[...] = jnp.zeros_like(stencil_ref)
    pf_ref[0] = 0

    # plane constants are pre-baked per bin: evaluate in tile-local coords
    xs8 = (
        jax.lax.broadcasted_iota(jnp.int32, (group, TILE_W), 1).astype(jnp.float32)
        + 0.5
    )
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (group, 1), 0).astype(jnp.float32)

    for p, (outline, depth_write, write_stencil, use_stencil) in enumerate(PASS_CFG):
        start = starts_ref[0, p, b]
        count = counts_ref[0, p, b]

        @pl.when(count > 0)
        def _():
            gbuf_ref[...] = jnp.zeros_like(gbuf_ref)
            gbuf_ref[G_Z] = jnp.full((TILE_H, TILE_W), 2.0)
            won_ref[...] = jnp.zeros_like(won_ref)
            n_chunks = pl.cdiv(count, CHUNK)

            def dma(slot, ci):
                return pltpu.make_async_copy(
                    rows_hbm.at[pl.ds(start + ci * CHUNK, CHUNK), :],
                    buf_ref.at[slot],
                    sem_ref.at[slot],
                )

            # chunk 0 may already be in flight (cross-pass prefetch below)
            @pl.when(pf_ref[0] == 0)
            def _():
                dma(0, 0).start()

            pf_ref[0] = 0

            def chunk_body(ci, _):
                slot = jax.lax.rem(ci, 2)

                @pl.when(ci + 1 < n_chunks)
                def _():
                    dma(jax.lax.rem(ci + 1, 2), ci + 1).start()

                dma(slot, ci).wait()
                left = count - ci * CHUNK

                def use_buf(buf):
                    def group_body(g, _):
                        _process_group(
                            buf, g, (left - g * group).astype(jnp.float32),
                            x0f, y0f, xs8, s_iota,
                            zbuf_ref, gbuf_ref, won_ref,
                            n_samples=n_samples, depth_write=depth_write,
                            with_attrs=not outline, analytic=analytic,
                            group=group, yband=yband,
                        )
                        return 0

                    n_groups = pl.cdiv(jnp.minimum(left, CHUNK), group)
                    jax.lax.fori_loop(0, n_groups, group_body, 0)

                # static two-way branch on the buffer slot (Mosaic prefers
                # static refs over dynamically indexed scratch)
                @pl.when(slot == 0)
                def _():
                    use_buf(buf_ref.at[0])

                @pl.when(slot == 1)
                def _():
                    use_buf(buf_ref.at[1])

                return 0

            jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
            # cross-pass prefetch: start the NEXT pass's first chunk now so
            # its first-chunk DMA latency hides behind this pass's push
            # (the common segment is a single ~5-pair chunk with no
            # intra-segment overlap at all). All of this pass's DMAs have
            # been waited, so slot 0 is free; the flag tells the next pass
            # to skip its own chunk-0 start.
            if p + 1 < N_PASSES:
                nstart = starts_ref[0, p + 1, b]
                ncount = counts_ref[0, p + 1, b]

                @pl.when(ncount > 0)
                def _():
                    pltpu.make_async_copy(
                        rows_hbm.at[pl.ds(nstart, CHUNK), :],
                        buf_ref.at[0], sem_ref.at[0],
                    ).start()
                    pf_ref[0] = 1

            _push_pass(
                stack_ref, stencil_ref, gbuf_ref, won_ref,
                outline=outline, write_stencil=write_stencil,
                use_stencil=use_stencil, n_samples=n_samples,
            )

    # ---- inline shade (same math as kernels/shade_tpu) ----
    xs32 = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
        + x0f + 0.5
    )
    ys32 = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
        + y0f + 0.5
    )
    for layer in range(2):
        stk = stack_ref[layer * ST.L_CH:(layer + 1) * ST.L_CH]
        base = layer * ST.O_CH
        any_present = jnp.max(stk[ST.L_AEFF]) > 0.0

        @pl.when(jnp.logical_not(any_present))
        def _():
            for ch in range(ST.O_CH):
                out_ref[base + ch] = jnp.full(
                    (TILE_H, TILE_W), -1.0 if ch == ST.O_TEX else 0.0
                )

        @pl.when(any_present)
        def _():
            ST._shade_layer(
                stk, knot_ref[...], tex_ref[...], edge_ref[...], ldir_ref[...],
                lcol_ref[...], misc_ref[...], inv_vp_ref[...], xs32, ys32,
                wp, hp, kr, kt, ke, out_ref, base, n_levels,
            )
        # a_eff rides in the rim channel's sibling: write it to O_AEFF slot
        out_ref[base + ST.O_AEFF] = stk[ST.L_AEFF]


def render_megakernel(
    tables: FrameTables,
    shade_tables: ST.ShadeTables,
    lights,
    rim_intensity: float,
    eye_pos: jax.Array,
    inv_vp: jax.Array,
    *,
    hp: int,
    wp: int,
    n_samples: int,
    interpret: bool = False,
    use_mips: bool = False,
    lod_bias: tuple[float, float] = (0.0, 0.0),
    analytic: bool = False,
    group: int | None = None,
    yband: bool | None = None,
) -> jax.Array:
    """-> (2*O_CH, HP, WP) shade outputs (see shade_tpu channel layout).

    Batched tables (leading character axis C on rows/starts/counts, built
    with jax.vmap over pack_pass_rows) add a leading C grid dimension:
    eye_pos/inv_vp then carry a C axis too and the result is
    (C, 2*O_CH, HP, WP) — the whole crowd rasterizes AND shades in one
    launch (BASELINE config #5).
    """
    batched = tables.rows.ndim == 3
    c_dim = tables.rows.shape[0] if batched else 1
    bx = wp // TILE_W
    by = hp // TILE_H
    n_p = tables.starts.shape[-2]
    b_tot = tables.starts.shape[-1]
    active = (jnp.arange(4) < lights.count).astype(jnp.float32)[:, None]
    lcol = lights.color * lights.intensity[:, None] * active
    ep = eye_pos if batched else eye_pos[None]  # (C, 3)
    misc = jnp.stack([
        jnp.broadcast_to(lights.ambient, (c_dim,)),
        jnp.full((c_dim,), rim_intensity, jnp.float32),
        ep[:, 0], ep[:, 1], ep[:, 2],
        jnp.full((c_dim,), shade_tables.atlas_stride, jnp.float32),
        jnp.full((c_dim,), lod_bias[0], jnp.float32),
        jnp.full((c_dim,), lod_bias[1], jnp.float32),
    ], axis=1)  # (C, 8)
    kernel = functools.partial(
        _frame_kernel, bx=bx, wp=wp, hp=hp, n_samples=n_samples,
        kr=shade_tables.knot_tab.shape[0], kt=shade_tables.tex_tab.shape[0],
        ke=shade_tables.edge_tab.shape[0],
        n_levels=shade_tables.tex_tab.shape[1] - 4 if use_mips else 0,
        batched=batched, analytic=analytic,
        group=GROUP if group is None else group,
        yband=YBAND if yband is None else yband,
    )
    if batched:
        grid = (c_dim, by, bx)
        sc_spec = pl.BlockSpec((1, n_p, b_tot), lambda c, i, j: (c, 0, 0),
                               memory_space=pltpu.SMEM)
        # (C, 1, 8) with (1, 1, 8) blocks: the block's last two dims equal
        # the array's, which Mosaic accepts for sub-(8,128) shapes
        misc = misc[:, None, :]
        misc_spec = pl.BlockSpec((1, 1, 8), lambda c, i, j: (c, 0, 0),
                                 memory_space=pltpu.VMEM)
        ivp_spec = pl.BlockSpec((1, 4, 4), lambda c, i, j: (c, 0, 0),
                                memory_space=pltpu.VMEM)
        out_specs = pl.BlockSpec(
            (1, 2 * ST.O_CH, TILE_H, TILE_W), lambda c, i, j: (c, 0, i, j),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(
            (c_dim, 2 * ST.O_CH, hp, wp), jnp.float32)
        dims_sem = ("arbitrary", "arbitrary", "arbitrary")
        starts, counts, ivp = tables.starts, tables.counts, inv_vp
    else:
        grid = (by, bx)
        sc_spec = pl.BlockSpec((1, n_p, b_tot), lambda i, j: (0, 0, 0),
                               memory_space=pltpu.SMEM)
        misc_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        ivp_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        out_specs = pl.BlockSpec(
            (2 * ST.O_CH, TILE_H, TILE_W), lambda i, j: (0, i, j),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((2 * ST.O_CH, hp, wp), jnp.float32)
        dims_sem = ("arbitrary", "arbitrary")
        starts, counts, ivp = tables.starts[None], tables.counts[None], inv_vp
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            sc_spec,  # starts
            sc_spec,  # counts
            pl.BlockSpec(memory_space=pl.ANY),  # rows (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # knot_tab
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tex_tab
            pl.BlockSpec(memory_space=pltpu.VMEM),  # edge_tab
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ldir
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lcol
            misc_spec,  # misc
            ivp_spec,  # inv_vp
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n_samples, TILE_H, TILE_W), jnp.float32),  # zbuf
            pltpu.VMEM((G_CH, TILE_H, TILE_W), jnp.float32),  # pass gbuf
            pltpu.VMEM((2 * ST.L_CH, TILE_H, TILE_W), jnp.float32),  # stack
            pltpu.VMEM((1, TILE_H, TILE_W), jnp.float32),  # stencil
            pltpu.VMEM((n_samples, TILE_H, TILE_W), jnp.float32),  # won
            pltpu.VMEM((2, CHUNK, ROW_W), jnp.float32),  # DMA buffers
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),  # cross-pass prefetch flag
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dims_sem,
        ),
        interpret=interpret,
    )(starts, counts, tables.rows,
      shade_tables.knot_tab, shade_tables.tex_tab, shade_tables.edge_tab,
      lights.direction, lcol, misc, ivp)
