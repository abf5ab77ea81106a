"""Pallas rasterizer v2: triangle-groups-on-sublanes formulation.

v1 (raster_tpu.py) walks triangles one at a time with scalar parameter
extraction (~0.9us/triangle — scalar-issue bound). v2 processes groups of 8
consecutive bin-list entries with the triangle axis mapped to sublanes:

  * the group's 8 triangle rows load as eight (1, 16) vector reads into a
    (8, 16) VMEM scratch; all plane parameters are then consumed as (8, 1)
    column slices broadcast against the (1, 128) pixel-row iota — zero
    scalar extraction in the inner loop
  * per pixel row: edge/depth planes evaluate as (8, 128) [tri x pixel]
    vregs; the per-lane winner among the 8 candidates is reduced with
    sublane min/argmax, and its interpolated attributes are selected with a
    take_along_axis sublane gather (vectorized dynamic_gather on TPU)
  * rows outside the group's bbox union are skipped with a dynamic fori
    range; the MSAA depth test runs per sample against the (1, 128) zbuf row

Same pass semantics and PassTables as v1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..render.raster import SAMPLE_OFFSETS
from .raster_tpu import (
    CH_COVER,
    CH_IW,
    CH_MAT,
    CH_Z,
    N_CH,
    TILE_H,
    TILE_W,
    PassTables,
    pack_tables,  # re-exported
)

GROUP = 8


def _raster_kernel_v2(
    starts_ref, counts_ref,
    tri_ref, attr_ref, ids_ref,
    zbuf_in_ref,
    zbuf_ref, gbuf_ref,
    won_ref, grp_ref,
    *,
    bx: int,
    n_samples: int,
    depth_write: bool,
    with_attrs: bool,
):
    b = pl.program_id(0)
    x0f = ((b % bx) * TILE_W).astype(jnp.float32)
    y0f = ((b // bx) * TILE_H).astype(jnp.float32)

    zbuf_ref[0] = zbuf_in_ref[0]
    gbuf_ref[0] = jnp.zeros((N_CH, TILE_H, TILE_W), jnp.float32)
    gbuf_ref[0, CH_MAT] = jnp.full((TILE_H, TILE_W), -1.0)
    won_ref[:] = jnp.zeros((n_samples, TILE_H, TILE_W), jnp.float32)

    xs = (
        jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1).astype(jnp.float32)
        + x0f + 0.5
    )  # (1, 128)
    tri_lane = jax.lax.broadcasted_iota(jnp.int32, (GROUP, TILE_W), 0)

    start = starts_ref[b]
    count = counts_ref[b]
    n_groups = (count + GROUP - 1) // GROUP

    def group_body(g, _):
        base = start + g * GROUP
        # load the group's triangle ids (8 sequential entries) and their
        # parameter rows into scratch — (8, 16) tri params + (8, 24) attrs
        for i in range(GROUP):
            n = base + i
            in_range = i < count - g * GROUP
            id_row = ids_ref[pl.ds(n // 128, 1), :]
            tid = pltpu.roll(id_row, shift=-(n % 128), axis=1)[0, 0].astype(jnp.int32)
            tid = jnp.where(in_range, tid, 0)
            grp_ref[pl.ds(i, 1), 0:16] = jnp.where(
                in_range, tri_ref[pl.ds(tid, 1), :], jnp.full((1, 16), 1e9)
            )
            if with_attrs:
                grp_ref[pl.ds(i, 1), 16:40] = attr_ref[pl.ds(tid, 1), :]
            else:
                grp_ref[pl.ds(i, 1), 16:40] = jnp.concatenate(
                    [jnp.zeros((1, 18)),
                     attr_ref[pl.ds(tid, 1), 18:19],
                     jnp.zeros((1, 5))], axis=1,
                )
            # valid mask in spare column 40
            grp_ref[pl.ds(i, 1), 40:41] = jnp.where(in_range, 1.0, 0.0).reshape(1, 1)

        s = grp_ref[:, :]  # (8, 48)
        ea0 = s[:, 0:1]
        ea1 = s[:, 1:2]
        ea2 = s[:, 2:3]
        eb0 = s[:, 3:4]
        eb1 = s[:, 4:5]
        eb2 = s[:, 5:6]
        ec0 = s[:, 6:7]
        ec1 = s[:, 7:8]
        ec2 = s[:, 8:9]
        za = s[:, 9:10]
        zbb = s[:, 10:11]
        zcc = s[:, 11:12]
        ymin = s[:, 12:13]
        ymax = s[:, 13:14]
        ok = s[:, 40:41] > 0.5  # (8, 1)

        # row range = union of the group's bboxes
        r0 = jnp.clip(
            (jnp.min(jnp.where(ok, ymin, 1e9)) - 0.5 - y0f).astype(jnp.int32),
            0, TILE_H - 1,
        )
        r1 = jnp.clip(
            (jnp.max(jnp.where(ok, ymax, -1e9)) + 0.5 - y0f).astype(jnp.int32),
            0, TILE_H - 1,
        )

        # per-tri x-precomputed edge terms: (8, 128)
        e0x = ea0 * xs + ec0
        e1x = ea1 * xs + ec1
        e2x = ea2 * xs + ec2
        zx = za * xs + zcc

        def row_body(r, _):
            yv = y0f + r.astype(jnp.float32) + 0.5
            e0 = e0x + eb0 * yv
            e1 = e1x + eb1 * yv
            e2 = e2x + eb2 * yv
            zz = zx + zbb * yv  # (8, 128)
            in_row = ok & (ymin <= yv + 0.5) & (ymax >= yv - 0.5)

            row = pl.ds(r, 1)
            win_any = jnp.zeros((1, TILE_W), jnp.bool_)
            best_z = jnp.full((8, TILE_W), jnp.inf)
            for smp in range(n_samples):
                dx, dy = SAMPLE_OFFSETS[smp]
                es0 = e0 + (ea0 * dx + eb0 * dy)
                es1 = e1 + (ea1 * dx + eb1 * dy)
                es2 = e2 + (ea2 * dx + eb2 * dy)
                zs = zz + (za * dx + zbb * dy)
                inside = (es0 >= 0) & (es1 >= 0) & (es2 >= 0) & in_row
                zrow = zbuf_ref[0, smp, row, :]  # (1, 128)
                passed = inside & (zs <= zrow) & (zs >= 0.0) & (zs <= 1.0)
                zm = jnp.where(passed, zs, jnp.inf)
                zmin = jnp.min(zm, axis=0, keepdims=True)  # (1, 128)
                got = zmin < jnp.inf
                if depth_write:
                    zbuf_ref[0, smp, row, :] = jnp.where(got, zmin, zrow)
                won_ref[smp, row, :] = jnp.where(
                    got, 1.0, won_ref[smp, row, :]
                )
                win_any = win_any | got
                best_z = jnp.minimum(best_z, zm)

            @pl.when(jnp.any(win_any))
            def _():
                # per-lane winner among the group: last-drawn (max sublane
                # index) among those matching the best depth of any sample
                zbest = jnp.min(best_z, axis=0, keepdims=True)  # (1, 128)
                cand = best_z <= zbest  # (8, 128) incl. inf==inf guards
                cand = cand & (best_z < jnp.inf)
                widx = jnp.max(
                    jnp.where(cand, tri_lane, -1), axis=0, keepdims=True
                )  # (1, 128)
                wsafe = jnp.broadcast_to(jnp.maximum(widx, 0), (GROUP, TILE_W))

                def sel(vals):  # (8, 128) -> winner row (1, 128)
                    # same-shape sublane dynamic_gather (every row identical),
                    # then keep row 0
                    return jnp.take_along_axis(vals, wsafe, axis=0)[0:1]

                mat = jnp.broadcast_to(s[:, 34:35], (GROUP, TILE_W))
                new_mat = sel(mat)
                old_mat = gbuf_ref[0, CH_MAT, row, :]
                gbuf_ref[0, CH_MAT, row, :] = jnp.where(win_any, new_mat, old_mat)
                old_z = gbuf_ref[0, CH_Z, row, :]
                gbuf_ref[0, CH_Z, row, :] = jnp.where(win_any, sel(zz), old_z)
                if with_attrs:
                    for ch in range(6):
                        a = s[:, 16 + ch : 17 + ch]
                        bb = s[:, 22 + ch : 23 + ch]
                        cc = s[:, 28 + ch : 29 + ch]
                        val = a * xs + bb * yv + cc
                        old = gbuf_ref[0, ch, row, :]
                        gbuf_ref[0, ch, row, :] = jnp.where(
                            win_any, sel(val), old
                        )

            return 0

        jax.lax.fori_loop(r0, r1 + 1, row_body, 0)
        return 0

    jax.lax.fori_loop(0, n_groups, group_body, 0)

    cover = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    for smp in range(n_samples):
        cover = cover + won_ref[smp]
    gbuf_ref[0, CH_COVER] = cover * (1.0 / n_samples)


def raster_pass_tpu2(
    tables: PassTables,
    zbuf: jax.Array,
    *,
    bx: int,
    depth_write: bool,
    with_attrs: bool = True,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    b, s = zbuf.shape[0], zbuf.shape[1]
    kernel = functools.partial(
        _raster_kernel_v2,
        bx=bx, n_samples=s, depth_write=depth_write, with_attrs=with_attrs,
    )
    zbuf_out, gbuf = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, s, TILE_H, TILE_W), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, s, TILE_H, TILE_W), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, N_CH, TILE_H, TILE_W), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(zbuf.shape, jnp.float32),
            jax.ShapeDtypeStruct((b, N_CH, TILE_H, TILE_W), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((s, TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((GROUP, 48), jnp.float32),
        ],
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tables.starts, tables.counts, tables.tri_tab, tables.attr_tab, tables.ids, zbuf)
    return zbuf_out, gbuf
