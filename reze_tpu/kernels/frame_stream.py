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
* per-pass state lives in lanes of a single (1024, 128) pixel-major
  scratch: shared per-sample depth (4) + per-(pass, sample) coverage (28)
  + per-pass packed winner keys (7) + per-pass resolved fragments
  (4 material passes x 19 + 3 outline passes x 1 = 79);
* depth ordering across passes inside a chunk is exact: the per-pass
  updates run in pass order, each testing against the zbuf updated by the
  previous pass's lanes;
* winner keys pack (z_q17 << 14 | 16383 - draw) — 14 draw bits per
  (tile, pass) segment (the r2 kernel's 13-bit aliasing is gone) and
  fragments resolve per chunk by one-hot MXU matmuls against the resident
  rows;
* the 7 sequential layer-stack pushes collapse into a closed form at tile
  end: the 2-layer stack recurrence (render/pipeline_tpu.push) reduces to
  l1 = LAST present fragment, l0 = SECOND-LAST if l1 is translucent else 0
  (opaque fragments zero the background; translucent ones displace), with
  the eye-stencil rule applied from pass 1's coverage before selection.

Output: the (1024, 2*L_CH) pixel-major stack block per tile, shaded by
kernels/shade_tpu like the r2 MXU path.

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

# ---- state lane layout (single (1024, 128) f32 scratch) ----
S_Z = 0                       # 4 per-sample depths (shared across passes)
S_WON = 4                     # 28 = N_PASSES x 4 per-sample coverage flags
S_BEST = S_WON + 4 * N_PASSES  # 7 packed winner keys (int32 bitcast)
S_FRAG = S_BEST + N_PASSES    # per-pass fragments
# material passes store [code, a0..5, b0..5, c0..5] (19 lanes); outline
# passes store [code] (1 lane)
MAT_PASSES = tuple(p for p, c in enumerate(PASS_CFG) if not c[0])  # 0,1,3,5
OUT_PASSES = tuple(p for p, c in enumerate(PASS_CFG) if c[0])  # 2,4,6
N_FRAG_MAT = 19
_frag_off = {}
_off = S_FRAG
for _p in range(N_PASSES):
    _frag_off[_p] = _off
    _off += N_FRAG_MAT if _p in MAT_PASSES else 1
N_STATE = _off  # 118
assert N_STATE <= 128, N_STATE
DEBUG = False  # pl.debug_print tracing (interpret mode)
DEBUG_RAW = False  # compose dumps raw state lanes 0..23 instead of the stack

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

    # bounds (8, B): searchsorted over the (bin*8 + pass) keys; pass slot 7
    # is unused by any pair, so its position = end of the tile's stream
    q = jnp.arange(b_total * 8, dtype=jnp.int32)
    bounds = jnp.searchsorted(sk, q).astype(jnp.int32).reshape(b_total, 8).T
    bounds = jnp.minimum(bounds, cap)

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
    zero = jnp.zeros_like(code)
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

    # exact (bin, tri) pair enumeration (cumsum + searchsorted)
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
    tri_of_k = jnp.minimum(
        jnp.searchsorted(ends_tri, k, side="right").astype(jnp.int32), t - 1
    )
    slot = k - starts_tri[tri_of_k]
    ok = k < total
    nx_k = jnp.maximum(nx[tri_of_k], 1)
    bin_y = by0[tri_of_k] + slot // nx_k
    bin_id = bin_y * bx + (bx0[tri_of_k] + slot % nx_k)
    return tab, (bin_id, ok, tri_of_k, total)


def _make_init_row() -> np.ndarray:
    row = np.zeros((1, 128), np.float32)
    row[0, S_Z:S_Z + 4] = 1.0
    best = np.full(N_PASSES, SENTINEL, np.int32)
    row[0, S_BEST:S_BEST + N_PASSES] = best.view(np.float32)
    return row


def _bcast(col, n=128):
    """(1024, 1) -> (1024, n) via MXU (plain lane broadcasts cost ~79
    ns/vreg; one small matmul is ~0.26 us for the whole column)."""
    return jnp.dot(col, jnp.ones((1, n), jnp.float32),
                   preferred_element_type=jnp.float32, precision=PREC)


def _process_chunk(
    state_ref, buf_ref, buft_ref, pxy_ref, x0, y0, win_base, bounds, t0, t1,
    *, n_samples,
):
    """Walk one 128-pair window: all passes present in it, in order."""
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
    center_ok = (e0c >= 0) & (e1c >= 0) & (e2c >= 0) & (zc >= 0.0) & (zc <= 1.0)

    # per-sample depth columns broadcast across pair lanes with ONE selection
    # matmul per pass (plain (1024,1)->(1024,128) lane broadcasts cost
    # ~79 ns/vreg); recomputed per PASS so cross-pass depth ordering inside
    # a chunk stays exact, while within a pass the r2 intra-chunk relaxation
    # (test vs pre-pass z, exact min update) is harmless as before
    selz = (jax.lax.broadcasted_iota(jnp.int32, (8, n_samples * CHUNK), 1)
            // CHUNK
            == jax.lax.broadcasted_iota(jnp.int32, (8, n_samples * CHUNK), 0)
            ).astype(jnp.float32)[0:n_samples, :]  # (S, S*128)

    for p, (outline, depth_write, _ws, _us) in enumerate(PASS_CFG):
        p0 = jnp.maximum(bounds[p], win_base)
        p1 = jnp.minimum(bounds[p + 1], win_base + CHUNK)

        @pl.when(p1 > p0)
        def _(p=p, outline=outline, depth_write=depth_write, p0=p0):
            in_p = (g_idx >= bounds[p]) & (g_idx < bounds[p + 1])  # (1, 128)
            zb_all = jnp.dot(state_ref[:, S_Z:S_Z + n_samples], selz,
                             preferred_element_type=jnp.float32,
                             precision=PREC)
            # --- per-sample depth test + coverage (pass-ordered) ---
            for s in range(n_samples):
                o0, o1, o2, oz = offs[s]
                zs = zc + oz
                inside = (
                    (e0c >= -o0) & (e1c >= -o1) & (e2c >= -o2) & in_p
                )
                zb = zb_all[:, s * CHUNK:(s + 1) * CHUNK]
                passed = inside & (zs <= zb) & (zs >= 0.0) & (zs <= 1.0)
                zmin_s = jnp.min(jnp.where(passed, zs, 2.0), axis=1,
                                 keepdims=True)
                if depth_write:
                    state_ref[:, S_Z + s:S_Z + s + 1] = jnp.minimum(
                        state_ref[:, S_Z + s:S_Z + s + 1], zmin_s)
                w = S_WON + 4 * p + s
                state_ref[:, w:w + 1] = jnp.maximum(
                    state_ref[:, w:w + 1], (zmin_s < 2.0).astype(jnp.float32)
                )

            # --- winner: packed (z_q17, draw) key min over this pass ---
            seg_id = jnp.clip(g_idx - bounds[p], 0, IDB - 1)
            key = (zq << 14) | (IDB - 1 - seg_id)
            key = jnp.where(center_ok & in_p, key, SENTINEL)
            kmin = jnp.min(key, axis=1, keepdims=True)  # (1024, 1) i32
            bl = S_BEST + p
            best = pltpu.bitcast(state_ref[:, bl:bl + 1], jnp.int32)
            new_best = jnp.minimum(best, kmin)
            state_ref[:, bl:bl + 1] = pltpu.bitcast(new_best, jnp.float32)

            # --- resolve fragment channels where this chunk improved ---
            win_id = (IDB - 1) - (new_best & (IDB - 1))
            local = win_id + (bounds[p] - win_base)  # lane of the winner
            improved = (new_best < best) & (new_best < SENTINEL)
            sel = jnp.where(improved, local, -1)
            onehot = (_bcast(sel.astype(jnp.float32))
                      == lane.astype(jnp.float32)).astype(jnp.float32)
            chunk = buf_ref[...]
            nf = N_FRAG_MAT if not outline else 1
            # cols: [code, attrs18, ones] — contiguous in the stream row
            # layout; the ones column rides along as the won indicator so
            # no second broadcast is needed
            cols = chunk[:, SC_CODE:SC_CODE + SC_RESOLVE_W]
            res = jax.lax.dot_general(
                onehot, cols, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=PREC,
            )  # (1024, SC_RESOLVE_W)
            frag = res[:, 0:nf]
            wonb = _bcast(res[:, SC_RESOLVE_W - 1:SC_RESOLVE_W])[:, 0:nf]
            fb = _frag_off[p]
            old = state_ref[:, fb:fb + nf]
            state_ref[:, fb:fb + nf] = frag * wonb + old * (1.0 - wonb)



def _compose_tile(state_ref, out_ref, pxy_ref, x0, y0, *, n_samples):
    """Closed-form 2-layer stack from the per-pass winner state.

    l1 = last present fragment (pass order), l0 = second-last if l1 is
    translucent else 0 — exactly the fixpoint of the per-pass push
    recurrence in render/pipeline_tpu.push (see module docstring).
    """
    st = state_ref[...]
    if DEBUG_RAW:
        d = int(DEBUG_RAW)
        out_ref[...] = st[:, d:d + 2 * ST.L_CH]
        return
    inv_s = 1.0 / n_samples
    # attr planes are GLOBAL-coordinate (only the edge/z quad table is
    # tile-folded): evaluate at global pixel centers, broadcast to the 6
    # attr lanes once via the MXU
    pxb = _bcast(pxy_ref[:, 0:1] + x0, 6)
    pyb = _bcast(pxy_ref[:, 1:2] + y0, 6)

    # per-pass scalars (pixel-major columns)
    present = []
    opaque_l = []
    a_eff_l = []
    z_l = []
    code_l = []
    hit_l = []
    # stencil: pass 1 (eyes) coverage
    best1 = pltpu.bitcast(st[:, S_BEST + 1:S_BEST + 2], jnp.int32)
    cover1 = sum(st[:, S_WON + 4 + s:S_WON + 5 + s] for s in range(n_samples))
    stencil = (best1 < SENTINEL) & (cover1 > 0.0)

    for p, (outline, _dw, _ws, use_stencil) in enumerate(PASS_CFG):
        cover = sum(
            st[:, S_WON + 4 * p + s:S_WON + 4 * p + s + 1]
            for s in range(n_samples)
        ) * inv_s
        bl = S_BEST + p
        best = pltpu.bitcast(st[:, bl:bl + 1], jnp.int32)
        hit = best < SENTINEL
        zc = (best >> 14).astype(jnp.float32) * (1.0 / ZQ)
        fb = _frag_off[p]
        code = jnp.round(st[:, fb:fb + 1]).astype(jnp.int32)
        alpha = (code & 1023).astype(jnp.float32) * (1.0 / 1023.0)
        is_hair = ((code >> 22) & 1).astype(jnp.float32)
        a = alpha
        if use_stencil:
            a = a * jnp.where(stencil & (is_hair > 0.5), 0.5, 1.0)
        ae = jnp.where(hit, a * cover, 0.0)
        pres = ae >= 0.001
        ae = jnp.where(pres, ae, 0.0)
        present.append(pres)
        opaque_l.append(pres & (ae > 0.999))
        a_eff_l.append(ae)
        z_l.append(zc)
        code_l.append(code)
        hit_l.append(hit)

    # take1: last present pass; take2: the one before it
    take1 = []
    take2 = []
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

    # l1 opaque? (needed to decide whether l0 survives)
    l1_opaque = jnp.zeros_like(present[0])
    for p in range(N_PASSES):
        l1_opaque = l1_opaque | (take1[p] & opaque_l[p])

    def layer(select, alive):
        """Build the 12 stack channels for one layer from the per-pass
        state under the one-hot pass-select columns."""
        zero = jnp.zeros((N_PX, 1))
        uvn = jnp.zeros((N_PX, 6))  # a,b,c-evaluated attr channels
        aeff = zero
        zch = zero
        outl = zero
        ramp = zero
        tex = zero
        edge = zero
        for p in range(N_PASSES):
            selp = (select[p] & alive).astype(jnp.float32)
            is_out = p in OUT_PASSES
            aeff = aeff + selp * a_eff_l[p]
            zch = zch + selp * z_l[p]
            rest = code_l[p] >> 10
            ramp = ramp + selp * (rest & 15).astype(jnp.float32)
            tex = tex + selp * ((rest >> 4) & 15).astype(jnp.float32)
            edge = edge + selp * ((rest >> 8) & 15).astype(jnp.float32)
            if is_out:
                outl = outl + selp
            else:
                fb = _frag_off[p]
                a6 = st[:, fb + 1:fb + 7]
                b6 = st[:, fb + 7:fb + 13]
                c6 = st[:, fb + 13:fb + 19]
                attrs = a6 * pxb + b6 * pyb + c6
                uvn = uvn + _bcast(selp, 6) * attrs
        return jnp.concatenate(
            [uvn, zch, aeff, outl, ramp, tex, edge], axis=1
        )  # (N_PX, L_CH)

    l1 = layer(take1, jnp.ones_like(present[0], jnp.bool_))
    l0 = layer(take2, ~l1_opaque)
    out_ref[...] = jnp.concatenate([l0, l1], axis=1)


def _frame_kernel_stream(
    bounds_ref,  # SMEM (8, B)
    rows_hbm,    # ANY (CAP + CHUNK, ROW_W)
    quad_hbm,    # ANY (8, 4 * (CAP + CHUNK))
    pxy_ref,     # VMEM (1024, 8): [x+.5, y+.5, 1, 0...] tile-local + GLOBAL
    #              px/py in lanes 3,4 for attr evaluation
    init_ref,    # VMEM (1, 128) state init row
    out_ref,     # (1024, 2 * L_CH) block
    state_ref, buf_ref, buft_ref, sem_ref, semt_ref,
    *,
    bx: int, n_samples: int,
):
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    b = bi * bx + bj
    x0 = (bj * TILE_W).astype(jnp.float32)
    y0 = (bi * TILE_H).astype(jnp.float32)
    t0 = bounds_ref[0, b]
    t1 = bounds_ref[7, b]

    @pl.when(t1 <= t0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(t1 > t0)
    def _():
        state_ref[...] = jnp.broadcast_to(init_ref[...], (N_PX, 128))
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

        bounds = [bounds_ref[p, b] for p in range(8)]

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
                    state_ref, bref, btref, pxy_ref, x0, y0, win_base,
                    bounds, t0, t1, n_samples=n_samples,
                )

            @pl.when(slot == 0)
            def _():
                use(buf_ref.at[0], buft_ref.at[0])

            @pl.when(slot == 1)
            def _():
                use(buf_ref.at[1], buft_ref.at[1])

            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
        _compose_tile(state_ref, out_ref, pxy_ref, x0, y0,
                      n_samples=n_samples)


def render_megakernel_stream(
    tables: StreamTables,
    *,
    hp: int,
    wp: int,
    n_samples: int,
    interpret: bool = False,
) -> jax.Array:
    """-> stack (B*1024, 2*L_CH) pixel-major, tile-major over bins."""
    bx = wp // TILE_W
    by = hp // TILE_H
    b = bx * by
    ii = np.arange(N_PX)
    pxy = np.zeros((N_PX, 8), np.float32)
    pxy[:, 0] = ii % TILE_W + 0.5
    pxy[:, 1] = ii // TILE_W + 0.5
    pxy[:, 2] = 1.0
    kernel = functools.partial(
        _frame_kernel_stream, bx=bx, n_samples=n_samples
    )
    return pl.pallas_call(
        kernel,
        grid=(by, bx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # bounds
            pl.BlockSpec(memory_space=pltpu.ANY),    # rows (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),    # quad (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pxy
            pl.BlockSpec(memory_space=pltpu.VMEM),   # init row
        ],
        out_specs=pl.BlockSpec(
            (N_PX, 2 * ST.L_CH), lambda i, j: (i * bx + j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * N_PX, 2 * ST.L_CH), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N_PX, 128), jnp.float32),
            pltpu.VMEM((2, CHUNK, ROW_W), jnp.float32),
            pltpu.VMEM((2, 8, 4 * CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(tables.bounds, tables.rows, tables.quad, jnp.asarray(pxy),
      jnp.asarray(_make_init_row()))
