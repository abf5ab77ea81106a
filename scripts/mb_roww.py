"""Can pair rows be 64 lanes instead of 128? (halves the big pack gather's
write traffic + kernel DMA bytes; only 37 columns are used).

Tests: (a) Mosaic DMA of (128, 64) f32 HBM->VMEM blocks inside a kernel,
(b) XLA row-gather timing (cap, 64) vs (cap, 128).
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CAP = 128 * 2048


def kernel(rows_hbm, out_ref, buf, sem, *, w):
    i = pl.program_id(0)

    def dma(ci):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds((i * 16 + ci) * 128, 128), :], buf, sem)

    acc = jnp.zeros((128, w), jnp.float32)
    def body(ci, acc):
        dma(ci).start()
        dma(ci).wait()
        return acc + buf[...]
    acc = jax.lax.fori_loop(0, 16, body, acc)
    out_ref[...] = acc


def run_kernel(w):
    rows = jnp.ones((CAP, w), jnp.float32)
    f = pl.pallas_call(
        functools.partial(kernel, w=w),
        grid=(CAP // (128 * 16),),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((128, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CAP // 16, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((128, w), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    g = jax.jit(f)
    r = g(rows); jax.block_until_ready(r)
    best = 1e9
    for _ in range(5):
        t0 = time.time(); jax.block_until_ready(g(rows))
        best = min(best, time.time() - t0)
    print(f"kernel DMA w={w:4d}: {best*1e3:7.3f} ms", flush=True)


def run_gather(w):
    t = 32768
    tab = jnp.ones((t, w), jnp.float32)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, t, (CAP,), np.int32))
    g = jax.jit(lambda i: tab[i].sum())
    jax.block_until_ready(g(idx))
    best = 1e9
    for _ in range(5):
        t0 = time.time(); jax.block_until_ready(g(idx))
        best = min(best, time.time() - t0)
    print(f"gather (cap,{w:3d}):  {best*1e3:7.3f} ms", flush=True)


for w in (128, 64):
    try:
        run_kernel(w)
    except Exception as e:
        print(f"kernel w={w} FAILED: {type(e).__name__}: {str(e)[:200]}")
for w in (128, 64, 40):
    run_gather(w)
