"""Microbench: the hybrid MXU chunk body for the frame megakernel.

Round-4 attribution: the group megakernel's body costs ~62 ns/pair
(500 ns per 8-pair sublane group) = 8.26 ms of the 11.91 ms megakernel at
1080p. The r2 MXU proto measured ~20 ns/pair for plane-eval-as-matmul but
(a) shipped a pre-transposed coefficient table from XLA (the 1080p compile
explosion suspect) and (b) ran PREC HIGHEST everywhere (6-pass f32 matmuls).

This measures the production-shaped replacement:
  * coefficients arrive PAIR-MAJOR (the existing rows layout, one DMA);
    the (CHUNK, 128) buffer transposes IN-KERNEL (Mosaic 2D transpose);
  * plane matmuls use a manual hi/lo bf16 split (2 DEFAULT passes) instead
    of HIGHEST (6): the pixel-matrix side is bf16-exact by construction
    (tile-local x+0.5 <= 127.5 = 255 * 2^-1, y+0.5 <= 7.5, 1.0);
  * analytic-coverage variant: ONE center plane eval per chunk, coverage
    from pre-scaled edge planes (pack writes e_i * 1/|grad e_i| columns);
  * winner: packed (z, draw-id) int key min-reduce; fragment resolve by
    one-hot matmul (hi/lo split), all in pixel-major (1024, lanes) state;
  * end-of-tile planar conversion: 8x transpose((128, 32)) turns the
    pixel-major stack columns back into (ch, 8, 128) tile rows.

Variants (env MB_VARIANT): transpose | analytic | msaa | convert
MB_SEGS (default 8): segments per tile; MB_CHUNKS: chunks per segment.
Prints ns/pair and a correctness check vs an XLA f32 oracle.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_PX = 1024
CHUNK = 128
ROW_W = 128

# hybrid row layout (cols 64:96 of the production rows are zero today)
H_SE0 = 64   # sea0, seb0, sec0 (edge plane / |grad|, tile-global c)
H_SE1 = 72
H_SE2 = 80
H_Z = 88     # za, zb, zc
H_CODE = 14  # packed material code (existing col)
H_ATTR = 19  # a0..5 b0..5 c0..5 (existing cols)


def _hi_lo(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _bcast_exact(col, n=CHUNK):
    """(1024, 1) f32 -> (1024, n): hi/lo split ones-matmul (2 DEFAULT)."""
    ones = jnp.ones((1, n), jnp.float32)
    hi, lo = _hi_lo(col)
    return _dot(hi, ones) + _dot(lo, ones)


def _bcast_small(col, n=CHUNK):
    """(1024, 1) -> (1024, n) for values exactly representable in bf16
    (flags, ids < 256)."""
    return _dot(col, jnp.ones((1, n), jnp.float32))


def analytic_chunk(state_z, state_won, state_best, state_frag,
                   buf, pxy, x0, y0, base, left):
    """One 128-pair analytic chunk. state_*: (1024, k) f32 values (carried
    functionally here; refs in the real kernel). Returns updated state."""
    bt = buf.T  # (ROW_W, CHUNK) — THE op under test
    quad = jnp.concatenate(
        [bt[H_SE0:H_SE0 + 8], bt[H_SE1:H_SE1 + 8],
         bt[H_SE2:H_SE2 + 8], bt[H_Z:H_Z + 8]], axis=1)  # (8, 4*CHUNK)
    row2 = jax.lax.broadcasted_iota(jnp.int32, quad.shape, 0) == 2
    fold = quad[0:1, :] * x0 + quad[1:2, :] * y0
    quad = quad + jnp.where(row2, fold, 0.0)
    qh, ql = _hi_lo(quad)
    E = _dot(pxy, qh) + _dot(pxy, ql)  # (1024, 512)
    se0 = E[:, 0:CHUNK]
    se1 = E[:, CHUNK:2 * CHUNK]
    se2 = E[:, 2 * CHUNK:3 * CHUNK]
    zz = E[:, 3 * CHUNK:4 * CHUNK]

    lane = jax.lax.broadcasted_iota(
        jnp.int32, (8, CHUNK), 1)[0:1, :].astype(jnp.float32)
    validf = (lane < left).astype(jnp.float32)  # (1, 128) bcasts on sublanes
    zb = _bcast_exact(state_z)  # current per-pixel depth across pair lanes
    cov = (jnp.clip(se0 + 0.5, 0.0, 1.0) * jnp.clip(se1 + 0.5, 0.0, 1.0)
           * jnp.clip(se2 + 0.5, 0.0, 1.0)) * validf
    zok = (zz <= zb) & (zz >= 0.0) & (zz <= 1.0)
    any_pass = (cov > 0.0) & zok
    center = (se0 >= 0) & (se1 >= 0) & (se2 >= 0) & zok & (validf > 0)
    zmin_c = jnp.min(jnp.where(center, zz, 2.0), axis=1, keepdims=True)
    new_z = jnp.minimum(state_z, zmin_c)
    new_won = jnp.maximum(
        state_won, jnp.max(jnp.where(any_pass, cov, 0.0), axis=1,
                           keepdims=True))

    # winner: packed (z, draw order) int key; chunk-local id + base
    ZQ = float(1 << 18)
    zq = jnp.clip(zz * ZQ, 0.0, ZQ - 1.0).astype(jnp.int32)
    gid = base + lane.astype(jnp.int32)
    key = (zq << 13) | (8191 - gid)
    key = jnp.where(any_pass, key, jnp.int32(2 ** 31 - 1))
    kmin = jnp.min(key, axis=1, keepdims=True)
    new_best = jnp.minimum(state_best, kmin)

    # fragment resolve for pixels this chunk won
    win_id = 8191 - (new_best & 8191)
    local = win_id - base
    won_now = (new_best < 2 ** 31 - 1) & (local >= 0) & (local < CHUNK)
    onehot = (_bcast_small(local.astype(jnp.float32))
              == jnp.broadcast_to(lane, (N_PX, CHUNK))).astype(jnp.float32)
    cols = jnp.concatenate(
        [buf[:, H_CODE:H_CODE + 1], buf[:, H_ATTR:H_ATTR + 18],
         jnp.zeros((CHUNK, 13), jnp.float32)], axis=1)  # (128, 32)
    ch, cl = _hi_lo(cols)
    frag = _dot(onehot, ch) + _dot(onehot, cl)  # (1024, 32)
    wb = _bcast_small(won_now.astype(jnp.float32), 32)
    new_frag = frag * wb + state_frag * (1.0 - wb)
    return new_z, new_won, new_best, new_frag


def make_kernel(variant, n_segs, n_chunks):
    def kernel(rows_hbm, pxy_ref, out_ref, state_ref, buf_ref, sem_ref):
        x0 = jnp.float32(128.0 * pl.program_id(0))
        y0 = jnp.float32(8.0 * pl.program_id(0))
        state_ref[...] = jnp.zeros_like(state_ref)
        state_ref[:, 0:1] = jnp.ones((N_PX, 1))  # z
        state_ref[:, 2:3] = jax.lax.bitcast_convert_type(
            jnp.full((N_PX, 1), 2 ** 31 - 1, jnp.int32), jnp.float32)
        pxy = pxy_ref[...]

        if variant == "transpose":
            pltpu.make_async_copy(
                rows_hbm.at[pl.ds(0, CHUNK), :], buf_ref.at[0],
                sem_ref.at[0]).start()
            pltpu.make_async_copy(
                rows_hbm.at[pl.ds(0, CHUNK), :], buf_ref.at[0],
                sem_ref.at[0]).wait()

            def body(i, acc):
                # data-dependence so the loop isn't hoisted (block store:
                # Mosaic cannot store scalars to VMEM)
                buf_ref[0, 0:1, 0:1] = buf_ref[0, 0:1, 0:1] + acc * 1e-20
                bt = buf_ref[0].T
                return acc + bt[1:2, 0:1]
            acc = jax.lax.fori_loop(
                0, n_segs * n_chunks, body, jnp.zeros((1, 1)))
            out_ref[:, 0:1] = jnp.broadcast_to(acc, (N_PX, 1))
            return

        def seg_body(s, _):
            def chunk_body(ci, _):
                slot = jax.lax.rem(ci, 2)
                pltpu.make_async_copy(
                    rows_hbm.at[pl.ds(ci * CHUNK, CHUNK), :],
                    buf_ref.at[slot], sem_ref.at[slot]).start()
                pltpu.make_async_copy(
                    rows_hbm.at[pl.ds(ci * CHUNK, CHUNK), :],
                    buf_ref.at[slot], sem_ref.at[slot]).wait()

                def use(buf):
                    z, won, best, frag = analytic_chunk(
                        state_ref[:, 0:1], state_ref[:, 1:2],
                        jax.lax.bitcast_convert_type(state_ref[:, 2:3], jnp.int32),
                        state_ref[:, 8:40],
                        buf[...], pxy, x0, y0, ci * CHUNK,
                        jnp.float32(CHUNK))
                    state_ref[:, 0:1] = z
                    state_ref[:, 1:2] = won
                    state_ref[:, 2:3] = jax.lax.bitcast_convert_type(best, jnp.float32)
                    state_ref[:, 8:40] = frag

                @pl.when(slot == 0)
                def _():
                    use(buf_ref.at[0])

                @pl.when(slot == 1)
                def _():
                    use(buf_ref.at[1])
                return 0
            jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
            return 0

        jax.lax.fori_loop(0, n_segs, seg_body, 0)

        if variant == "convert":
            # pixel-major stack -> planar: 8 x transpose((128, 32))
            def conv(r, acc):
                blk = state_ref[pl.ds(r * 128, 128), 8:40]
                t = blk.T  # (32, 128)
                return acc + t[0:1, :] * 1e-6
            acc = jax.lax.fori_loop(0, 8, conv, jnp.zeros((1, 128)))
            out_ref[:, 0:1] = jnp.broadcast_to(
                jnp.sum(acc, axis=1, keepdims=True), (N_PX, 1))
            return
        out_ref[...] = state_ref[...]

    return kernel


FORCE_INTERPRET = os.environ.get("MB_INTERPRET", "0") == "1"


def run(variant, n_segs, n_chunks, interpret=False):
    interpret = interpret or FORCE_INTERPRET
    rng = np.random.default_rng(0)
    n_rows = n_chunks * CHUNK
    rows = np.zeros((n_rows + CHUNK, ROW_W), np.float32)
    # plausible triangle planes: small coefficients, z in [0, 1]
    for base_col in (H_SE0, H_SE1, H_SE2):
        rows[:, base_col + 0] = rng.normal(0, 0.05, n_rows + CHUNK)
        rows[:, base_col + 1] = rng.normal(0, 0.05, n_rows + CHUNK)
        rows[:, base_col + 2] = rng.normal(2.0, 3.0, n_rows + CHUNK)
    rows[:, H_Z + 0] = rng.normal(0, 1e-4, n_rows + CHUNK)
    rows[:, H_Z + 1] = rng.normal(0, 1e-4, n_rows + CHUNK)
    rows[:, H_Z + 2] = rng.uniform(0.2, 0.9, n_rows + CHUNK)
    rows[:, H_CODE] = rng.integers(0, 8 * 1024, n_rows + CHUNK)
    rows[:, H_ATTR:H_ATTR + 18] = rng.normal(0, 0.3, (n_rows + CHUNK, 18))

    ii = np.arange(N_PX)
    pxy = np.zeros((N_PX, 8), np.float32)
    pxy[:, 0] = ii % 128 + 0.5
    pxy[:, 1] = ii // 128 + 0.5
    pxy[:, 2] = 1.0

    grid = (16,)
    f = pl.pallas_call(
        make_kernel(variant, n_segs, n_chunks),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N_PX, 40), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_PX, 40), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N_PX, 40), jnp.float32),
            pltpu.VMEM((2, CHUNK, ROW_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )
    fj = jax.jit(lambda r, p: f(r, p))
    r_d, p_d = jnp.asarray(rows), jnp.asarray(pxy)
    t0 = time.time()
    out = jax.block_until_ready(fj(r_d, p_d))
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(fj(r_d, p_d))
        best = min(best, time.time() - t0)
    n_pairs = grid[0] * n_segs * n_chunks * CHUNK
    per_pair = best / n_pairs * 1e9
    per_chunk = best / (grid[0] * n_segs * n_chunks) * 1e6
    print(f"{variant:10s} segs={n_segs} chunks={n_chunks}: "
          f"{per_pair:6.1f} ns/pair  {per_chunk:7.2f} us/chunk  "
          f"(compile {compile_s:.1f}s, total {best*1e3:.2f} ms)")
    return out


def oracle_check():
    """Interpret-mode full-precision vs chip: validates the hi/lo split."""
    out_hw = run("analytic", 1, 2, interpret=False)
    out_it = run("analytic", 1, 2, interpret=True)
    z_err = float(jnp.max(jnp.abs(out_hw[:, 0] - out_it[:, 0])))
    f_err = float(jnp.max(jnp.abs(out_hw[:, 8:27] - out_it[:, 8:27])))
    best_match = float(jnp.mean(
        (jax.lax.bitcast_convert_type(out_hw[:, 2:3], jnp.int32)
         == jax.lax.bitcast_convert_type(out_it[:, 2:3], jnp.int32)).astype(jnp.float32)))
    print(f"precision: max z err {z_err:.2e}, max frag err {f_err:.2e}, "
          f"winner match {best_match*100:.2f}%")


if __name__ == "__main__":
    variant = os.environ.get("MB_VARIANT", "all")
    if variant == "oracle":
        oracle_check()
    elif variant == "all":
        run("transpose", 4, 4)
        run("analytic", 2, 1)
        run("analytic", 2, 4)
        run("analytic", 8, 1)
        run("convert", 2, 1)
        oracle_check()
    else:
        run(variant, int(os.environ.get("MB_SEGS", 4)),
            int(os.environ.get("MB_CHUNKS", 4)))
