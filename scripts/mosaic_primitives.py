"""Measure Mosaic primitive costs in-kernel: the cost model for the
rasterizer inner loop. Each variant runs a fori loop of N iterations doing
K ops of one primitive on (8, 128) f32."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 8  # ops per iteration


def make_kernel(variant, n_iter=20000):
    def kernel(x_ref, out_ref, scratch):
        scratch[...] = x_ref[...]

        def body(i, v):
            # v: (8, 128) vector carry — no scalar round trips in the loop
            if variant == "nop":
                v = v * 1.000001
            elif variant == "fma":
                for _ in range(K):
                    v = v * 1.000001 + 0.000001
            elif variant == "sublane_min":
                for _ in range(K):
                    r = jnp.min(v, axis=0, keepdims=True)
                    v = v + r
            elif variant == "lane_slice":
                for _ in range(K):
                    v = v * v[:, 3:4] + 1e-9
            elif variant == "row_rmw":
                for j in range(K):
                    row = scratch[j:j + 1, :]
                    scratch[j:j + 1, :] = row * 1.000001
                v = v + scratch[0:8, :] * 1e-20
            elif variant == "dyn_row_rmw":
                for j in range(K):
                    y = (i + j) % 32
                    row = scratch[pl.ds(y, 1), :]
                    scratch[pl.ds(y, 1), :] = row * 1.000001
                v = v + scratch[0:8, :] * 1e-20
            elif variant == "take_along":
                idx = (v[0:1, :] * 0).astype(jnp.int32) + (i % 8)
                for _ in range(K):
                    v = v + jnp.take_along_axis(v, idx, axis=0) * 1e-20
            elif variant == "when_branch":
                for _ in range(K):
                    @pl.when(jnp.any(v > -1e9))
                    def _():
                        scratch[0:1, :] = scratch[0:1, :] * 1.000001
                v = v * 1.000001
            elif variant == "sublane_bcast":
                for _ in range(K):
                    v = v * scratch[0:1, :] * 1e-20 + v
            elif variant == "lane_bcast_plain":
                for _ in range(K):
                    b = jnp.broadcast_to(v[:, 3:4], (8, 128))
                    v = v + b * 1e-20
            elif variant == "lane_bcast_mxu":
                ones = jnp.ones((1, 128))
                for _ in range(K):
                    b = jnp.dot(v[:, 3:4], ones, preferred_element_type=jnp.float32)
                    v = v + b * 1e-20
            elif variant == "lane_slice_only":
                acc = v[:, 0:1]
                for _ in range(K):
                    acc = acc + v[:, 3:4]
                v = v + acc * 1e-20
            elif variant == "transpose8":
                for _ in range(K):
                    t = jnp.transpose(v[0:8, 0:8])
                    v = v.at[0:8, 0:8].set(t * 1e-20 + v[0:8, 0:8]) if False else v + jnp.pad(t, ((0,0),(0,120))) * 1e-20
            else:
                raise ValueError(variant)
            return v

        out = jax.lax.fori_loop(0, n_iter, body, x_ref[0:8, :] * 1.0)
        out_ref[0, 0] = jnp.sum(out)

    return kernel


def run(variant):
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 128))
    times = {}
    for n in (20000, 220000):
        f = pl.pallas_call(
            make_kernel(variant, n_iter=n),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.VMEM((32, 128), jnp.float32)],
        )
        fj = jax.jit(lambda x: f(x))
        float(fj(x)[0, 0])  # warm
        best = 1e9
        for r in range(3):
            t0 = time.time()
            float(fj(x + r * 1e-6)[0, 0])
            best = min(best, time.time() - t0)
        times[n] = best
    per_iter = (times[220000] - times[20000]) / 200000
    print(f"{variant:16s}: {per_iter*1e9/K:7.2f} ns/op  {per_iter*1e9:7.1f} ns/iter(K={K})")


for v in ["nop", "lane_bcast_plain", "lane_bcast_mxu", "lane_slice_only"]:
    try:
        run(v)
    except Exception as e:
        print(f"{v}: FAILED {str(e)[:120]}")
