"""Pallas TPU rasterizer — the hot path.

One kernel invocation rasterizes one pass (a class-sorted triangle list) over
the whole frame: grid = (bins,), each grid step owns a 32x128-pixel tile
whose per-sample depth and G-buffer stay VMEM-resident while the bin's
triangle list is walked. Compared to the XLA formulation
(render/raster.py), this removes all per-pixel gathers: fragment attributes
are interpolated *inside* the kernel from per-triangle plane equations and
written under the win mask, so shading downstream is pure dense math.

Layout decisions (TPU-first):
* tiles are (32, 128) px — one f32 vreg row (8, 128) per MSAA band step,
  4 bands per tile; band-range skipping bounds per-triangle work by its
  bounding box.
* triangle setup is packed as plane equations: 3 edges + depth + 6
  interpolants, all affine in screen space -> the inner loop is pure FMA +
  compare/select on (8, 128) vectors.
* binning produces one *global* bin-sorted pair list (no per-bin capacity,
  no overflow): the kernel walks its [start, start+count) segment. Triangle
  ids are stored as f32 (Mosaic cannot scalar-read 1-D int VMEM).
* MSAA: per-sample depth test in VMEM scratch; coverage = fraction of
  samples won, folded into alpha at blend time (matches render/raster.py).

Reference parity: same pass semantics as the WebGPU pipelines
(engine.ts:335-899) — less-equal depth, draw-order ties, front/back/none
culling (applied at setup), fragment-last-writer-wins.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..render.raster import SAMPLE_OFFSETS, TriSetup

TILE_H = 32
TILE_W = 128
BANDS = TILE_H // 8
# (8, 128) tiles were tried — static band addressing, but ~2x the bin pairs;
# net loss. 32-row tiles with a dynamic band loop win.
# The Mosaic toolchain here crashes compiling kernels whose triangle tables
# exceed ~16384 rows; passes larger than this are sliced at the XLA level
# (pipeline_tpu._sliced_raster) and their G-buffers merged.
MAX_TRIS_PER_CALL = 8192

# G-buffer channels
CH_UIW, CH_VIW, CH_NXIW, CH_NYIW, CH_NZIW, CH_IW, CH_MAT, CH_COVER, CH_Z = range(9)
N_CH = 9


class PassTables(NamedTuple):
    tab: jax.Array  # (T, 40) f32: [0:16] edges+depth+bbox, [16:35] attrs+mat
    ids: jax.Array  # (cap,) i32 pair triangle ids (SMEM — scalar-read)
    starts: jax.Array  # (B,) i32
    counts: jax.Array  # (B,) i32
    overflow: jax.Array  # () i32 — (bin,tri) pairs beyond the static cap


def pack_tables(
    tri: TriSetup,
    corner_uv: jax.Array,  # (T, 3, 2)
    corner_nrm: jax.Array,  # (T, 3, 3)
    tri_mat: jax.Array,  # (T,)
    by: int,
    bx: int,
) -> PassTables:
    """XLA-side setup: plane equations + global sorted bin pairs."""
    t = tri.valid.shape[0]
    inv2a = tri.inv_area2[:, None]  # (T, 1)

    # depth plane: z(x,y) = sum_k E_k(x,y) * z_k * inv2a
    za = jnp.sum(tri.ea * tri.z, axis=1) * inv2a[:, 0]
    zb = jnp.sum(tri.eb * tri.z, axis=1) * inv2a[:, 0]
    zc = jnp.sum(tri.ec * tri.z, axis=1) * inv2a[:, 0]

    big = jnp.float32(1e9)
    xmin = jnp.where(tri.valid, jnp.min(tri.sx, axis=1), big)
    xmax = jnp.where(tri.valid, jnp.max(tri.sx, axis=1), -big)
    ymin = jnp.where(tri.valid, jnp.min(tri.sy, axis=1), big)
    ymax = jnp.where(tri.valid, jnp.max(tri.sy, axis=1), -big)

    # edge coefficients pre-scaled by inv2a: bary_k = E_k * inv2a
    ea = tri.ea * inv2a
    eb = tri.eb * inv2a
    ec = tri.ec * inv2a

    tri_tab = jnp.concatenate(
        [
            ea, eb, ec,
            jnp.stack([za, zb, zc], axis=1),
            jnp.stack([ymin, ymax, xmin, xmax], axis=1),
        ],
        axis=1,
    )  # (T, 16)

    # interpolant planes: ch(x,y) = sum_k bary_k * v_k  (bary pre-scaled)
    iw = tri.inv_w  # (T, 3)
    vals = jnp.concatenate(
        [
            corner_uv * iw[..., None],  # uiw, viw
            corner_nrm * iw[..., None],  # n*iw
            iw[..., None],  # iw
        ],
        axis=-1,
    )  # (T, 3, 6)
    a_ch = jnp.einsum("tk,tkc->tc", ea, vals)
    b_ch = jnp.einsum("tk,tkc->tc", eb, vals)
    c_ch = jnp.einsum("tk,tkc->tc", ec, vals)
    tab = jnp.concatenate(
        [tri_tab, a_ch, b_ch, c_ch, tri_mat[:, None].astype(jnp.float32),
         jnp.zeros((t, 5))],
        axis=1,
    )  # (T, 40); one row read feeds both edge walk and attribute planes

    # --- binning: exact (bin, tri) pair enumeration, globally sorted ---
    # Every (tile, triangle) overlap is emitted (no per-triangle slot cap —
    # a triangle spanning any number of tiles gets full coverage). The only
    # bound is the static pair capacity; pairs beyond it are counted in
    # `overflow` (the tail of the draw-order pair list is dropped).
    bx0 = jnp.clip(jnp.floor((xmin - 0.5) / TILE_W), 0, bx - 1).astype(jnp.int32)
    bx1 = jnp.clip(jnp.floor((xmax + 0.5) / TILE_W), 0, bx - 1).astype(jnp.int32)
    by0 = jnp.clip(jnp.floor((ymin - 0.5) / TILE_H), 0, by - 1).astype(jnp.int32)
    by1 = jnp.clip(jnp.floor((ymax + 0.5) / TILE_H), 0, by - 1).astype(jnp.int32)
    nx = bx1 - bx0 + 1
    ny = by1 - by0 + 1
    live = tri.valid & (xmax >= xmin)
    n_bins_tri = jnp.where(live, nx * ny, 0)

    cap = 2 * MAX_TRIS_PER_CALL
    ends_tri = jnp.cumsum(n_bins_tri)  # (T,)
    starts_tri = ends_tri - n_bins_tri
    total = ends_tri[-1]
    k = jnp.arange(cap, dtype=jnp.int32)
    tri_of_k = jnp.minimum(
        jnp.searchsorted(ends_tri, k, side="right").astype(jnp.int32), t - 1
    )
    slot = k - starts_tri[tri_of_k]
    ok = k < total
    nx_k = jnp.maximum(nx[tri_of_k], 1)
    bin_id = (by0[tri_of_k] + slot // nx_k) * bx + (bx0[tri_of_k] + slot % nx_k)

    b_total = by * bx
    shift = 1 << 18
    key = jnp.where(ok, bin_id * shift + tri_of_k, b_total * shift)
    key = jnp.sort(key)
    pair_bin = key // shift
    pair_tri = key % shift
    ids = jnp.where(pair_bin < b_total, pair_tri, 0).astype(jnp.int32)
    bins_arange = jnp.arange(b_total, dtype=jnp.int32)
    starts = jnp.minimum(
        jnp.searchsorted(pair_bin, bins_arange).astype(jnp.int32), cap
    )
    ends = jnp.minimum(
        jnp.searchsorted(pair_bin, bins_arange, side="right").astype(jnp.int32),
        cap,
    )

    if t > MAX_TRIS_PER_CALL:
        raise ValueError(
            f"pass has {t} triangles > {MAX_TRIS_PER_CALL}; slice the pass "
            "(see pipeline_tpu._sliced_raster)"
        )
    overflow = jnp.maximum(total - cap, 0)
    return PassTables(tab, ids, starts, ends - starts, overflow)


def _raster_kernel(
    # scalar-prefetch style SMEM inputs
    starts_ref, counts_ref,
    # VMEM table + SMEM pair ids
    tab_ref, ids_ref,
    zbuf_in_ref,  # (S, 32, 128) incoming depth (aliased storage)
    # outputs
    zbuf_ref,  # (S, 32, 128) aliased in/out
    gbuf_ref,  # (N_CH, 32, 128)
    # scratch
    won_ref,  # (S, 32, 128) f32 0/1
    *,
    bx: int,
    n_samples: int,
    depth_write: bool,
    with_attrs: bool,
):
    b = pl.program_id(0) * bx + pl.program_id(1)
    x0 = pl.program_id(1) * TILE_W
    y0 = pl.program_id(0) * TILE_H
    x0f = x0.astype(jnp.float32)
    y0f = y0.astype(jnp.float32)

    # init outputs (blocked output contents are undefined until written, even
    # with input_output_aliases — copy the incoming depth explicitly).
    # Only CH_MAT needs clearing: every other G-buffer channel is either
    # gated on CH_MAT >= 0 downstream or overwritten (CH_COVER at finalize).
    zbuf_ref[...] = zbuf_in_ref[...]
    gbuf_ref[CH_MAT] = jnp.full((TILE_H, TILE_W), -1.0)

    xs = (
        jax.lax.broadcasted_iota(jnp.int32, (8, TILE_W), 1).astype(jnp.float32)
        + x0f + 0.5
    )  # (8, 128)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (8, TILE_W), 0).astype(
        jnp.float32
    )

    start = starts_ref[b]
    count = counts_ref[b]

    @pl.when(count == 0)
    def _():
        gbuf_ref[CH_COVER] = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    @pl.when(count > 0)
    def _():
        _raster_bin_tris(
            start, count, x0f, y0f, xs, row_iota,
            tab_ref, ids_ref, zbuf_ref, gbuf_ref, won_ref,
            n_samples=n_samples, depth_write=depth_write, with_attrs=with_attrs,
        )


def _raster_bin_tris(
    start, count, x0f, y0f, xs, row_iota,
    tab_ref, ids_ref, zbuf_ref, gbuf_ref, won_ref,
    *, n_samples, depth_write, with_attrs,
):
    won_ref[:] = jnp.zeros((n_samples, TILE_H, TILE_W), jnp.float32)

    def tri_body(k, _):
        n = start + k
        tid = ids_ref[n]  # SMEM scalar load
        trow = tab_ref[pl.ds(tid, 1), :]  # one (1,40) vector load
        ea0 = trow[0, 0]
        ea1 = trow[0, 1]
        ea2 = trow[0, 2]
        eb0 = trow[0, 3]
        eb1 = trow[0, 4]
        eb2 = trow[0, 5]
        ec0 = trow[0, 6]
        ec1 = trow[0, 7]
        ec2 = trow[0, 8]
        za = trow[0, 9]
        zbc = trow[0, 10]
        zcc = trow[0, 11]
        ymin = trow[0, 12]
        ymax = trow[0, 13]

        b0 = jnp.clip(
            jnp.floor((ymin - 0.5 - y0f) / 8.0).astype(jnp.int32), 0, BANDS - 1
        )
        b1 = jnp.clip(
            jnp.floor((ymax + 0.5 - y0f) / 8.0).astype(jnp.int32), 0, BANDS - 1
        )

        def band_body(bi, _):
            ys = row_iota + (y0f + bi.astype(jnp.float32) * 8.0 + 0.5)
            e0 = ea0 * xs + eb0 * ys + ec0
            e1 = ea1 * xs + eb1 * ys + ec1
            e2 = ea2 * xs + eb2 * ys + ec2
            zz = za * xs + zbc * ys + zcc
            row = pl.ds(bi * 8, 8)

            any_pass = jnp.zeros((8, TILE_W), jnp.bool_)
            for s in range(n_samples):
                dx, dy = SAMPLE_OFFSETS[s]
                o0 = ea0 * dx + eb0 * dy
                o1 = ea1 * dx + eb1 * dy
                o2 = ea2 * dx + eb2 * dy
                oz = za * dx + zbc * dy
                inside = ((e0 + o0) >= 0) & ((e1 + o1) >= 0) & ((e2 + o2) >= 0)
                zs = zz + oz
                zcur = zbuf_ref[s, row, :]
                passed = inside & (zs <= zcur) & (zs >= 0.0) & (zs <= 1.0)
                if depth_write:
                    zbuf_ref[s, row, :] = jnp.where(passed, zs, zcur)
                won_ref[s, row, :] = jnp.where(
                    passed, 1.0, won_ref[s, row, :]
                )
                any_pass = any_pass | passed

            @pl.when(jnp.any(any_pass))
            def _():
                arow = trow  # attrs live in the same row at lane 16+
                mat = arow[0, 34]
                cur_m = gbuf_ref[CH_MAT, row, :]
                gbuf_ref[CH_MAT, row, :] = jnp.where(any_pass, mat, cur_m)
                cur_z = gbuf_ref[CH_Z, row, :]
                gbuf_ref[CH_Z, row, :] = jnp.where(any_pass, zz, cur_z)
                if with_attrs:
                    for ch in range(6):
                        a = arow[0, 16 + ch]
                        bb = arow[0, 22 + ch]
                        cc = arow[0, 28 + ch]
                        val = a * xs + bb * ys + cc
                        cur = gbuf_ref[ch, row, :]
                        gbuf_ref[ch, row, :] = jnp.where(any_pass, val, cur)

            return 0

        jax.lax.fori_loop(b0, b1 + 1, band_body, 0)
        return 0

    jax.lax.fori_loop(0, count, tri_body, 0)

    # coverage = fraction of samples won by this pass
    cover = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    for s in range(n_samples):
        cover = cover + won_ref[s]
    gbuf_ref[CH_COVER] = cover * (1.0 / n_samples)


def raster_pass_tpu(
    tables: PassTables,
    zbuf: jax.Array,  # (S, HP, WP) planar
    *,
    bx: int,
    depth_write: bool,
    with_attrs: bool = True,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Run one raster pass; returns (zbuf', gbuf (N_CH, HP, WP)).

    Outputs are planar row-major framebuffers — downstream shading reshapes
    to (ch, P) for free instead of paying an untile transpose."""
    s, hp, wp = zbuf.shape
    by = hp // TILE_H
    assert wp // TILE_W == bx
    kernel = functools.partial(
        _raster_kernel,
        bx=bx,
        n_samples=s,
        depth_write=depth_write,
        with_attrs=with_attrs,
    )
    zbuf_out, gbuf = pl.pallas_call(
        kernel,
        grid=(by, bx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # starts
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counts
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tab
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pair ids
            pl.BlockSpec(
                (s, TILE_H, TILE_W), lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),  # zbuf (aliased)
        ],
        out_specs=[
            pl.BlockSpec(
                (s, TILE_H, TILE_W), lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (N_CH, TILE_H, TILE_W), lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(zbuf.shape, jnp.float32),
            jax.ShapeDtypeStruct((N_CH, hp, wp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((s, TILE_H, TILE_W), jnp.float32)],
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(tables.starts, tables.counts, tables.tab, tables.ids, zbuf)
    return zbuf_out, gbuf
