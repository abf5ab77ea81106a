"""Merged-stream frame megakernel: ONE pair walk per tile for all 7 passes.

Round 2 measured the per-(tile, pass) segment architecture at ~13 us of
FIXED cost per segment (first-chunk DMA latency, state resets, control
flow) x 2040 tiles x 7 passes = ~180 ms-equivalent, while the complete
chunk body runs at 20 ns/pair (docs/DESIGN.md).  This kernel restructures
the walk so a tile pays its fixed costs ONCE:

* the (bin, tri) pairs of ALL 7 passes are sorted into one stream by
  (tile, pass, draw id); each tile walks its contiguous segment in
  double-buffered 128-pair chunks — pass boundaries fall INSIDE chunks and
  are handled with lane masks, so a typical tile (~35 pairs) is one DMA +
  one matmul set for the whole frame instead of seven;
* ONE center plane matmul per chunk ((1024,8)@(8,512) via the MXU); the 4
  MSAA sample positions reuse it through per-lane offset rows
  (E_s = E_c + a*dx + b*dy as a (1,512) row) instead of 4 more matmuls;
* the per-pass walk is a lax.fori_loop over passes, NOT 7 unrolled
  pl.when regions: Mosaic sums the vector stack across unrolled regions
  (v1 of this kernel demanded 38.6 MB of scoped VMEM and ran 3x slower
  than the grouped kernel, spill-bound); a single loop region keeps the
  live set at one pass's temporaries. Per-pass divergence (depth-write
  flag, stream bounds) is data, read from SMEM at the loop index;
* depth ordering across passes inside a chunk is exact: pass p+1 tests
  against the per-sample depth already updated by pass p (pass-ordered
  loop iterations);
* winner keys pack (z_q17 << 14 | 16383 - draw) — 14 draw bits per
  (tile, pass) segment; fragments resolve per chunk by one-hot MXU
  matmuls against the resident rows;
* the kernel emits RAW per-pass winner state (best key, per-sample
  coverage, resolved fragment) — the 2-layer stack compose runs in XLA
  (compose_stream_state): on (1024-pixel, lane) tiles the compose math is
  (1024, 1) single-lane column ops at ~1/128 lane utilization (~31 ms of
  the v1 frame); as planar XLA elementwise it fuses into the
  pixel-major -> spatial relayout the caller already performs.

Output: (B*1024, S_OUT) pixel-major raw state, composed + shaded by the
caller (render/pipeline_tpu.py + kernels/shade_tpu.py).

Reference parity: pass ordering and fixed-function state of
engine.ts:2123-2243 (less-equal depth, draw-order ties, per-pass cull at
setup, 4x MSAA per-sample depth with coverage-to-alpha).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..render.raster import SAMPLE_OFFSETS, TriSetup
from . import shade_tpu as ST
from .frame_tpu import CHUNK, N_PASSES, PASS_CFG, ROW_W

TILE_H = 8
TILE_W = 128
N_PX = TILE_H * TILE_W

MAT_PASSES = tuple(p for p, c in enumerate(PASS_CFG) if not c[0])  # 0,1,3,5
OUT_PASSES = tuple(p for p, c in enumerate(PASS_CFG) if c[0])  # 2,4,6
N_FRAG = 19  # [code, a0..5, b0..5, c0..5] (uniform; outline rows carry 0s)

# ---- per-pass scratch block: rows [p*N_PX:(p+1)*N_PX] of a (7*N_PX, PS_W)
# buffer (dynamic SUBLANE offsets are cheap; dynamic lane offsets are not)
PS_BEST = 0                   # packed winner key (i32 bitcast)
PS_WON = 1                    # 4 per-sample coverage flags
PS_FRAG = PS_WON + 4          # 19 resolved fragment lanes
PS_W = PS_FRAG + N_FRAG       # 24

# ---- raw output lanes per pixel (pixel-major (B*1024, S_OUT)) ----
O_BEST = 0                    # 7 winner keys
O_COVER = O_BEST + N_PASSES   # 7 summed coverage (0..n_samples)
O_FRAG = O_COVER + N_PASSES   # 7 x 19 fragment lanes
S_OUT = O_FRAG + N_PASSES * N_FRAG  # 147 -> padded to 256 lanes by Mosaic

# stream row layout (differs from frame_tpu: code and attrs are packed
# contiguously so the one-hot resolve is ONE matmul slice):
# 0:9   edge planes (ea0 eb0 ec0 ea1 eb1 ec1 ea2 eb2 ec2, pre-divided)
# 9:12  depth plane (za zb zc)
# 12    packed material code
# 13:31 attribute planes (a0..5 b0..5 c0..5)
# 31    constant 1.0 (won indicator in the resolve matmul)
SC_CODE = 12
SC_ATTR = 13
SC_ONES = 31
SC_RESOLVE_W = 20  # [code, attrs18, ones]
ZQ = float(1 << 17)
IDB = 1 << 14  # draw-id bits per (tile, pass) segment
SENTINEL = np.int32(2**31 - 1)
# All MXU dots need full f32: the TPU default matmul precision truncates
# inputs to bf16 (8 mantissa bits), which rounds packed material codes
# (1023 -> 1024), destroys edge/depth plane evaluation at large pixel
# coordinates (y-dependent coverage dropout), and corrupts one-hot selects
# of f32 values. HIGHEST lowers to the bf16_6x passes = f32-faithful.
PREC = jax.lax.Precision.HIGHEST


class StreamTables(NamedTuple):
    rows: jax.Array     # (CAP + CHUNK, ROW_W) f32 pair rows, stream order
    quad: jax.Array     # (8, 4 * (CAP + CHUNK)) plane-coefficient blocks
    bounds: jax.Array   # (8, B) i32: [p, b] = stream start of (tile b, pass
    #                     p); row 7 = end of tile b's stream
    overflow: jax.Array  # () i32 dropped pairs


def pack_stream(
    pass_tabs: list[jax.Array],   # per pass (T_p, ROW_W) triangle rows
    pass_bins: list[tuple],       # per pass (bin_id (capp,), ok, tri_of_k)
    by: int,
    bx: int,
) -> StreamTables:
    """Merge per-pass (bin, tri) pair enumerations into one sorted stream."""
    b_total = by * bx
    # key layout: ((bin*8 + pass) << 15) + tri must fit int32 — the sentinel
    # (b_total*8) << 15 is the largest key (mirrors pack_pass_rows' bound)
    assert (b_total * 8) < (1 << 16), (
        f"render target too large for the stream sort key: {b_total} bins")
    keys = []
    row_of_tri_offsets = []
    overflow = jnp.int32(0)
    off = 0
    for p, tab in enumerate(pass_tabs):
        bin_id, ok, tri_of_k, total_p = pass_bins[p]
        t = tab.shape[0]
        assert t < (1 << 15)
        # sort key: (bin, pass, tri) — tri index IS draw order within a pass
        k = jnp.where(
            ok,
            ((bin_id * 8 + p) << 15) + tri_of_k,
            jnp.int32((b_total * 8) << 15),
        )
        keys.append(k)
        row_of_tri_offsets.append(off)
        overflow = overflow + jnp.maximum(total_p - ok.shape[0], 0)
        off += t
    tab_all = jnp.concatenate(pass_tabs)  # (sumT, ROW_W)
    key = jnp.sort(jnp.concatenate(keys))
    cap = key.shape[0]
    sk = key >> 15  # bin * 8 + pass (sorted)
    live = sk < b_total * 8
    tri = key & ((1 << 15) - 1)
    pass_of = jnp.where(live, sk & 7, 0)
    offs = jnp.asarray(row_of_tri_offsets, jnp.int32)
    row_idx = jnp.where(live, offs[pass_of] + tri, 0)
    rows = tab_all[row_idx]  # (cap, ROW_W) — the big gather
    rows = jnp.where(live[:, None], rows, 0.0)

    # bounds (8, B): segment starts over the (bin*8 + pass) keys; pass slot
    # 7 is unused by any pair, so its position = end of the tile's stream.
    # histogram + exclusive cumsum (monotone searchsorted is slow on TPU —
    # see build_pass_rows)
    counts_q = jnp.zeros((b_total * 8,), jnp.int32).at[sk].add(
        1, mode="drop", indices_are_sorted=True)
    bounds = jnp.cumsum(counts_q) - counts_q  # exclusive: #{sk < q}
    bounds = jnp.minimum(bounds, cap).reshape(b_total, 8).T

    rows_all = jnp.concatenate([rows, jnp.zeros((CHUNK, ROW_W))])
    n = rows_all.shape[0]
    qd = rows_all[:, :12].reshape(n // CHUNK, CHUNK, 4, 3)
    qd = qd.transpose(3, 0, 2, 1).reshape(3, n * 4)
    quad = jnp.concatenate([qd, jnp.zeros((5, n * 4))], axis=0)
    return StreamTables(
        rows=rows_all, quad=quad, bounds=bounds, overflow=overflow,
    )


def build_pass_rows(
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
) -> tuple[jax.Array, tuple]:
    """One pass -> (tab (T, ROW_W), (bin_id, ok, tri_of_k)) for pack_stream.

    Same row layout as frame_tpu.pack_pass_rows plus a constant-1.0 column
    at SC_ONES (the one-hot resolve matmul reads it as a won indicator).
    """
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
    code = (jnp.round(jnp.clip(alpha, 0.0, 1.0) * 1023.0)
            + 1024.0 * (ramp_gid + 16.0 * tex_gid + 256.0 * edge_gid
                        + 4096.0 * is_hair.astype(jnp.float32)))
    cols = [
        ea[:, 0], eb[:, 0], ec[:, 0],
        ea[:, 1], eb[:, 1], ec[:, 1],
        ea[:, 2], eb[:, 2], ec[:, 2],
        za, zb, zc, code,
    ]
    if with_attrs:
        iw = tri.inv_w
        vals = jnp.concatenate(
            [corner_uv * iw[..., None], corner_nrm * iw[..., None],
             iw[..., None]], axis=-1,
        )
        a_ch = jnp.einsum("tk,tkc->tc", ea, vals)
        b_ch = jnp.einsum("tk,tkc->tc", eb, vals)
        c_ch = jnp.einsum("tk,tkc->tc", ec, vals)
        attr = jnp.concatenate([a_ch, b_ch, c_ch], axis=1)
    else:
        attr = jnp.zeros((t, 18))
    tab = jnp.stack(cols, axis=1)  # (T, 13)
    ones = jnp.where(tri.valid, 1.0, 0.0)[:, None]
    tab = jnp.concatenate(
        [tab, attr, ones, jnp.zeros((t, ROW_W - SC_ONES - 1))], axis=1
    )

    # exact (bin, tri) pair enumeration. The run-length expansion
    # "tri_of_k[k] = the i with starts[i] <= k < ends[i]" is NOT done with
    # searchsorted: its monotone queries lower to ~log2(t) serialized gather
    # rounds over (cap,) and measured 26.5 ms of the 32 ms pack at 1080p.
    # Because k = arange(cap) is monotone, one scatter-add of segment marks
    # at each triangle's start + a cumsum gives the same map in O(cap)
    # vector work (scatter drops out-of-cap indices).
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
    marks = jnp.zeros((cap,), jnp.int32).at[starts_tri].add(
        1, mode="drop", indices_are_sorted=True)
    tri_of_k = jnp.clip(jnp.cumsum(marks) - 1, 0, t - 1)
    # ONE (cap, 4) row gather instead of 4 scalar gathers: gather cost is
    # per-index, not per-element (4 separate gathers measured 7.25 ms of
    # the 1080p pack across passes; one packed gather ~1.8 ms)
    enum_tab = jnp.stack([starts_tri, nx, by0, bx0], axis=1)  # (t, 4) i32
    vals = enum_tab[tri_of_k]
    slot = k - vals[:, 0]
    ok = k < total
    nx_k = jnp.maximum(vals[:, 1], 1)
    bin_y = vals[:, 2] + slot // nx_k
    bin_id = bin_y * bx + (vals[:, 3] + slot % nx_k)
    return tab, (bin_id, ok, tri_of_k, total)


def _bcast(col, n=128):
    """(1024, 1) -> (1024, n) via MXU (plain lane broadcasts cost ~79
    ns/vreg; one small matmul is ~0.26 us for the whole column)."""
    return jnp.dot(col, jnp.ones((1, n), jnp.float32),
                   preferred_element_type=jnp.float32, precision=PREC)


def _process_chunk(
    z_ref, pass_ref, buf_ref, buft_ref, pxy_ref, dw_ref, x0, y0, win_base,
    bounds_ref, b, *, n_samples,
):
    """Walk one 128-pair window: fori_loop over the passes present in it."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, CHUNK), 1)[0:1, :]
    g_idx = win_base + lane  # (1, 128) global stream index of each lane

    quad = buft_ref[...]  # (8, 512): rows [a; b; c; 0..] x [e0|e1|e2|z]
    # fold tile origin into the plane constants: tile-local evaluation keeps
    # f32 rounding identical per tile (z-tie stability, frame_tpu comment)
    fold = quad[0:1, :] * x0 + quad[1:2, :] * y0
    row2 = (jax.lax.broadcasted_iota(jnp.int32, (8, 4 * CHUNK), 0) == 2)
    quad = quad + jnp.where(row2, jnp.broadcast_to(fold, (8, 4 * CHUNK)), 0.0)

    # ONE matmul: all 4 planes at the pixel CENTER for 128 pairs
    pxy = pxy_ref[...]  # (1024, 8) tile-local [x+.5, y+.5, 1, 0...]
    E = jnp.dot(pxy, quad, preferred_element_type=jnp.float32,
                precision=PREC)
    e0c = E[:, 0:128]
    e1c = E[:, 128:256]
    e2c = E[:, 256:384]
    zc = E[:, 384:512]

    # per-sample plane offsets as (1, 128) rows: E_s = E_c + a dx + b dy
    offs = []
    for s in range(n_samples):
        dx, dy = SAMPLE_OFFSETS[s]
        o = quad[0:1, :] * dx + quad[1:2, :] * dy  # (1, 512)
        offs.append((o[:, 0:128], o[:, 128:256], o[:, 256:384], o[:, 384:512]))

    # center winner key for all lanes (shared; masked per pass below)
    zq = jnp.clip(zc * ZQ, 0.0, ZQ - 1.0).astype(jnp.int32)

    chunk = buf_ref[...]
    resolve_cols = chunk[:, SC_CODE:SC_CODE + SC_RESOLVE_W]

    def pass_body(p, _):
        b0 = bounds_ref[0, p, b]
        b1 = bounds_ref[0, p + 1, b]
        p0 = jnp.maximum(b0, win_base)
        p1 = jnp.minimum(b1, win_base + CHUNK)

        @pl.when(p1 > p0)
        def _():
            in_p = (g_idx >= b0) & (g_idx < b1)  # (1, 128)
            dw = dw_ref[0, p]  # depth-write flag (data, not code)
            rb = p * N_PX
            # --- per-sample depth test + coverage (pass-ordered) ---
            any_pass = None
            for s in range(n_samples):
                o0, o1, o2, oz = offs[s]
                zs = zc + oz
                inside = (
                    (e0c >= -o0) & (e1c >= -o1) & (e2c >= -o2) & in_p
                )
                zcol = z_ref[:, s:s + 1]
                zb = _bcast(zcol)
                passed = inside & (zs <= zb) & (zs >= 0.0) & (zs <= 1.0)
                zmin_s = jnp.min(jnp.where(passed, zs, 2.0), axis=1,
                                 keepdims=True)
                won_s = zmin_s < 2.0
                z_ref[:, s:s + 1] = jnp.where(
                    dw > 0, jnp.minimum(zcol, zmin_s), zcol)
                w = PS_WON + s
                pass_ref[pl.ds(rb, N_PX), w:w + 1] = jnp.maximum(
                    pass_ref[pl.ds(rb, N_PX), w:w + 1],
                    won_s.astype(jnp.float32),
                )
                any_pass = passed if any_pass is None else (any_pass | passed)

            # --- winner: packed (z_q17, draw) key min over this pass.
            # Gate = passed ANY sample (the grouped kernel's rule): at
            # silhouette pixels the center can be outside the triangle
            # while samples are covered; center-gating drops those
            # fragments entirely ---
            seg_id = jnp.clip(g_idx - b0, 0, IDB - 1)
            key = (zq << 14) | (IDB - 1 - seg_id)
            key = jnp.where(any_pass, key, SENTINEL)
            kmin = jnp.min(key, axis=1, keepdims=True)  # (1024, 1) i32
            best = pltpu.bitcast(
                pass_ref[pl.ds(rb, N_PX), PS_BEST:PS_BEST + 1], jnp.int32)
            new_best = jnp.minimum(best, kmin)
            pass_ref[pl.ds(rb, N_PX), PS_BEST:PS_BEST + 1] = pltpu.bitcast(
                new_best, jnp.float32)

            # --- resolve fragment channels where this chunk improved ---
            win_id = (IDB - 1) - (new_best & (IDB - 1))
            local = win_id + (b0 - win_base)  # lane of the winner
            improved = (new_best < best) & (new_best < SENTINEL)
            sel = jnp.where(improved, local, -1)
            onehot = (_bcast(sel.astype(jnp.float32))
                      == lane.astype(jnp.float32)).astype(jnp.float32)
            res = jax.lax.dot_general(
                onehot, resolve_cols, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=PREC,
            )  # (1024, SC_RESOLVE_W)
            frag = res[:, 0:N_FRAG]
            wonb = _bcast(res[:, SC_RESOLVE_W - 1:SC_RESOLVE_W], N_FRAG)
            old = pass_ref[pl.ds(rb, N_PX), PS_FRAG:PS_FRAG + N_FRAG]
            pass_ref[pl.ds(rb, N_PX), PS_FRAG:PS_FRAG + N_FRAG] = (
                frag * wonb + old * (1.0 - wonb))

        return 0

    jax.lax.fori_loop(0, N_PASSES, pass_body, 0)


def _frame_kernel_stream(
    bounds_ref,  # SMEM (1, 8, B) block (per character when batched)
    dw_ref,      # SMEM (1, 8) i32 per-pass depth-write flags
    rows_hbm,    # ANY (CAP + CHUNK, ROW_W), leading C axis when batched
    quad_hbm,    # ANY (8, 4 * (CAP + CHUNK)), leading C axis when batched
    pxy_ref,     # VMEM (1024, 8): [x+.5, y+.5, 1, 0...] tile-local
    out_ref,     # (1024, S_OUT) block
    z_ref, pass_ref, buf_ref, buft_ref, sem_ref, semt_ref,
    *,
    bx: int, n_samples: int, batched: bool = False,
):
    if batched:
        # grid (C, by, bx): one character per leading grid step
        c = pl.program_id(0)
        bi = pl.program_id(1)
        bj = pl.program_id(2)
        rows_hbm = rows_hbm.at[c]
        quad_hbm = quad_hbm.at[c]
    else:
        bi = pl.program_id(0)
        bj = pl.program_id(1)
    b = bi * bx + bj
    x0 = (bj * TILE_W).astype(jnp.float32)
    y0 = (bi * TILE_H).astype(jnp.float32)
    t0 = bounds_ref[0, 0, b]
    t1 = bounds_ref[0, 7, b]

    @pl.when(t1 <= t0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        # empty tiles still need sentinel winner keys (hit = best < SENTINEL)
        sent = pltpu.bitcast(
            jnp.full((N_PX, N_PASSES), SENTINEL, jnp.int32), jnp.float32)
        out_ref[:, O_BEST:O_BEST + N_PASSES] = sent

    @pl.when(t1 > t0)
    def _():
        z_ref[...] = jnp.ones_like(z_ref)
        pass_ref[...] = jnp.zeros_like(pass_ref)
        pass_ref[:, PS_BEST:PS_BEST + 1] = pltpu.bitcast(
            jnp.full((N_PASSES * N_PX, 1), SENTINEL, jnp.int32), jnp.float32)
        astart = (t0 // CHUNK) * CHUNK
        n_chunks = pl.cdiv(t1 - astart, CHUNK)

        def dma(slot, ci):
            return pltpu.make_async_copy(
                rows_hbm.at[pl.ds(astart + ci * CHUNK, CHUNK), :],
                buf_ref.at[slot], sem_ref.at[slot],
            )

        def dma_t(slot, ci):
            return pltpu.make_async_copy(
                quad_hbm.at[:, pl.ds((astart + ci * CHUNK) * 4, 4 * CHUNK)],
                buft_ref.at[slot], semt_ref.at[slot],
            )

        dma(0, 0).start()
        dma_t(0, 0).start()

        def chunk_body(ci, _):
            slot = jax.lax.rem(ci, 2)

            @pl.when(ci + 1 < n_chunks)
            def _():
                dma(jax.lax.rem(ci + 1, 2), ci + 1).start()
                dma_t(jax.lax.rem(ci + 1, 2), ci + 1).start()

            dma(slot, ci).wait()
            dma_t(slot, ci).wait()
            win_base = astart + ci * CHUNK

            def use(bref, btref):
                _process_chunk(
                    z_ref, pass_ref, bref, btref, pxy_ref, dw_ref, x0, y0,
                    win_base, bounds_ref, b, n_samples=n_samples,
                )

            @pl.when(slot == 0)
            def _():
                use(buf_ref.at[0], buft_ref.at[0])

            @pl.when(slot == 1)
            def _():
                use(buf_ref.at[1], buft_ref.at[1])

            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

        # ---- emit raw per-pass state (compose happens in XLA) ----
        for p in range(N_PASSES):
            rb = p * N_PX
            out_ref[:, O_BEST + p:O_BEST + p + 1] = pass_ref[
                pl.ds(rb, N_PX), PS_BEST:PS_BEST + 1]
            cov = pass_ref[pl.ds(rb, N_PX), PS_WON:PS_WON + 1]
            for s in range(1, n_samples):
                cov = cov + pass_ref[pl.ds(rb, N_PX), PS_WON + s:PS_WON + s + 1]
            out_ref[:, O_COVER + p:O_COVER + p + 1] = cov
            fb = O_FRAG + p * N_FRAG
            out_ref[:, fb:fb + N_FRAG] = pass_ref[
                pl.ds(rb, N_PX), PS_FRAG:PS_FRAG + N_FRAG]


def render_megakernel_stream(
    tables: StreamTables,
    *,
    hp: int,
    wp: int,
    n_samples: int,
    interpret: bool = False,
) -> jax.Array:
    """-> raw state (B*1024, S_OUT) pixel-major, tile-major over bins.

    With batched tables (leading character axis C on every field — build
    them with jax.vmap over pack_stream) the grid gains a leading C
    dimension and the result is (C*B*1024, S_OUT): one kernel launch
    rasterizes the whole crowd instead of a sequential per-character
    lax.map (BASELINE config #5).
    """
    batched = tables.rows.ndim == 3
    c_dim = tables.rows.shape[0] if batched else 1
    bx = wp // TILE_W
    by = hp // TILE_H
    b = bx * by
    ii = np.arange(N_PX)
    pxy = np.zeros((N_PX, 8), np.float32)
    pxy[:, 0] = ii % TILE_W + 0.5
    pxy[:, 1] = ii // TILE_W + 0.5
    pxy[:, 2] = 1.0
    dw = np.asarray(
        [[1 if c[1] else 0 for c in PASS_CFG] + [0]], np.int32)  # (1, 8)
    kernel = functools.partial(
        _frame_kernel_stream, bx=bx, n_samples=n_samples, batched=batched
    )
    if batched:
        grid = (c_dim, by, bx)
        in_specs = [
            # per-character (8, B) bounds block prefetched to SMEM
            pl.BlockSpec((1, 8, b), lambda c, i, j: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        out_specs = pl.BlockSpec(
            (N_PX, S_OUT), lambda c, i, j: (c * b + i * bx + j, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((c_dim * b * N_PX, S_OUT),
                                         jnp.float32)
        dims_sem = ("arbitrary", "arbitrary", "arbitrary")
    else:
        grid = (by, bx)
        in_specs = [
            pl.BlockSpec((1, 8, b), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.SMEM),   # bounds
            pl.BlockSpec(memory_space=pltpu.SMEM),   # depth-write flags
            pl.BlockSpec(memory_space=pl.ANY),    # rows (HBM)
            pl.BlockSpec(memory_space=pl.ANY),    # quad (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pxy
        ]
        out_specs = pl.BlockSpec(
            (N_PX, S_OUT), lambda i, j: (i * bx + j, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((b * N_PX, S_OUT), jnp.float32)
        dims_sem = ("arbitrary", "arbitrary")
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((N_PX, n_samples), jnp.float32),          # depth
            pltpu.VMEM((N_PASSES * N_PX, PS_W), jnp.float32),    # per-pass
            pltpu.VMEM((2, CHUNK, ROW_W), jnp.float32),
            pltpu.VMEM((2, 8, 4 * CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dims_sem,
        ),
        interpret=interpret,
    )(tables.bounds if batched else tables.bounds[None],
      jnp.asarray(dw), tables.rows, tables.quad, jnp.asarray(pxy))


def compose_stream_state(
    raw: jax.Array,  # (B*1024, S_OUT) pixel-major raw state
    hp: int,
    wp: int,
    n_samples: int,
) -> jax.Array:
    """Raw per-pass winner state -> (2*L_CH, hp, wp) planar 2-layer stack.

    The closed form of the per-pass push recurrence
    (render/pipeline_tpu.push): l1 = LAST present fragment in pass order,
    l0 = SECOND-LAST if l1 is translucent else empty (an opaque fragment
    zeroes the stack beneath it), with the eye-stencil rule (pass 1
    coverage halves hair alpha) applied before presence. Runs in XLA:
    planar elementwise ops fuse into the pixel-major -> spatial relayout.
    """
    bx = wp // TILE_W
    by = hp // TILE_H
    # pixel-major tile-major -> spatial planar (S_OUT, hp, wp)
    st = raw.reshape(by, bx, TILE_H, TILE_W, S_OUT)
    st = st.transpose(4, 0, 2, 1, 3).reshape(S_OUT, hp, wp)

    inv_s = 1.0 / n_samples
    best = [st[O_BEST + p].view(jnp.int32) for p in range(N_PASSES)]
    cover = [st[O_COVER + p] * inv_s for p in range(N_PASSES)]
    code = [
        jnp.round(st[O_FRAG + p * N_FRAG]).astype(jnp.int32)
        for p in range(N_PASSES)
    ]

    # stencil: pass 1 (eyes) hit+coverage
    stencil = (best[1] < SENTINEL) & (cover[1] > 0.0)

    present, opaque_l, a_eff_l, z_l = [], [], [], []
    for p, (outline, _dw, _ws, use_stencil) in enumerate(PASS_CFG):
        hit = best[p] < SENTINEL
        alpha = (code[p] & 1023).astype(jnp.float32) * (1.0 / 1023.0)
        is_hair = ((code[p] >> 22) & 1).astype(jnp.float32)
        a = alpha
        if use_stencil:
            a = a * jnp.where(stencil & (is_hair > 0.5), 0.5, 1.0)
        ae = jnp.where(hit, a * cover[p], 0.0)
        pres = ae >= 0.001
        present.append(pres)
        opaque_l.append(pres & (ae > 0.999))
        a_eff_l.append(jnp.where(pres, ae, 0.0))
        z_l.append((best[p] >> 14).astype(jnp.float32) * (1.0 / ZQ))

    # take1: last present pass; take2: the one before it
    take1, take2 = [], []
    seen1 = jnp.zeros_like(present[0])
    seen2 = jnp.zeros_like(present[0])
    for p in range(N_PASSES - 1, -1, -1):
        t1 = present[p] & ~seen1
        seen1 = seen1 | present[p]
        t2 = present[p] & seen1 & ~t1 & ~seen2
        seen2 = seen2 | t2
        take1.append(t1)
        take2.append(t2)
    take1 = take1[::-1]
    take2 = take2[::-1]

    l1_opaque = jnp.zeros_like(present[0])
    for p in range(N_PASSES):
        l1_opaque = l1_opaque | (take1[p] & opaque_l[p])

    px = jnp.arange(wp, dtype=jnp.float32)[None, :] + 0.5
    py = jnp.arange(hp, dtype=jnp.float32)[:, None] + 0.5

    def layer(select, alive):
        z = jnp.zeros((hp, wp))
        uvn = [z] * 6
        aeff = z
        zch = z
        outl = z
        ramp = z
        tex = z
        edge = z
        for p, (is_out, *_rest) in enumerate(PASS_CFG):
            selp = (select[p] & alive).astype(jnp.float32)
            aeff = aeff + selp * a_eff_l[p]
            zch = zch + selp * z_l[p]
            rest = code[p] >> 10
            ramp = ramp + selp * (rest & 15).astype(jnp.float32)
            tex = tex + selp * ((rest >> 4) & 15).astype(jnp.float32)
            edge = edge + selp * ((rest >> 8) & 15).astype(jnp.float32)
            if is_out:
                outl = outl + selp
            else:
                fb = O_FRAG + p * N_FRAG
                for c in range(6):
                    a6 = st[fb + 1 + c]
                    b6 = st[fb + 7 + c]
                    c6 = st[fb + 13 + c]
                    uvn[c] = uvn[c] + selp * (a6 * px + b6 * py + c6)
        return jnp.stack(uvn + [zch, aeff, outl, ramp, tex, edge])

    l1 = layer(take1, jnp.ones_like(present[0]))
    l0 = layer(take2, ~l1_opaque)
    return jnp.concatenate([l0, l1], axis=0)  # (2*L_CH, hp, wp)
