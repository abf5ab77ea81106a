"""Round-3 kernel-formulation microbench: measure the primitives that decide
the merged-stream rasterizer layout (pair-major vs pixel-major state).

Each variant runs a fori loop in ONE pallas kernel; cost comes from an
iteration-count delta (result caching + tunnel sync artifacts per
scripts/tbench.py). Shapes are the real candidates:

  pixel-major: state (1024 px, 128 lanes); planes E = (1024,8)@(8,512);
               winner = LANE-min; resolve = one-hot (1024,128)@(128,24).
  pair-major:  E^T = (512,8)@(8,1024) (4 plane blocks x 128 pairs on
               sublanes); winner = SUBLANE-min -> (1,1024); planar state
               (8,128)/channel via (1,1024)->(8,128) reshape.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(variant, n_iter):
    def kernel(lhs_ref, rhs_ref, big_ref, wide_ref, out_ref):
        # lhs_ref: (1024, 8)   rhs_ref: (8, 1024)
        # big_ref: (1024, 128) wide_ref: (128, 1024)
        def body(i, v):
            # v: (8, 128) carry; dep = tiny sublane-broadcast dependence
            dep8 = v[0:1, 0:8] * 1e-30  # (1, 8)
            dep128 = v[0:1, :] * 1e-30  # (1, 128)
            dep1024 = jnp.concatenate([dep128] * 8, axis=1)  # (1, 1024)

            if variant == "mm_1024x8x512":
                lhs = lhs_ref[...] + dep8
                e = jnp.dot(lhs, rhs_ref[:, 0:512],
                            preferred_element_type=jnp.float32)
                v = v + e[0:8, 0:128] * 1e-20
            elif variant == "mm_1024x8x512_x5":
                lhs = lhs_ref[...] + dep8
                acc = v
                for _ in range(5):
                    e = jnp.dot(lhs, rhs_ref[:, 0:512],
                                preferred_element_type=jnp.float32)
                    acc = acc + e[0:8, 0:128] * 1e-20
                    lhs = lhs + e[0:1, 0:8] * 1e-20
                v = acc
            elif variant == "mm_512x8x1024":
                lhs = lhs_ref[0:512, :] + dep8
                e = jnp.dot(lhs, rhs_ref[...],
                            preferred_element_type=jnp.float32)
                v = v + e[0:8, 0:128] * 1e-20
            elif variant == "mm_512x8x1024_x5":
                lhs = lhs_ref[0:512, :] + dep8
                acc = v
                for _ in range(5):
                    e = jnp.dot(lhs, rhs_ref[...],
                                preferred_element_type=jnp.float32)
                    acc = acc + e[0:8, 0:128] * 1e-20
                    lhs = lhs + e[0:1, 0:8] * 1e-20
                v = acc
            elif variant == "mm_896x8x1024":
                lhs = jnp.concatenate([lhs_ref[...] + dep8] * 1, axis=0)
                lhs = lhs[0:896, :]
                e = jnp.dot(lhs, rhs_ref[...],
                            preferred_element_type=jnp.float32)
                v = v + e[0:8, 0:128] * 1e-20
            elif variant == "lane_min_1024x128":
                x = big_ref[...] + dep128
                r = jnp.min(x, axis=1, keepdims=True)  # (1024, 1)
                v = v + r[0:8, :] * 1e-20
            elif variant == "lane_min_1024x128_x5":
                x = big_ref[...] + dep128
                acc = v
                for _ in range(5):
                    r = jnp.min(x, axis=1, keepdims=True)
                    acc = acc + r[0:8, :] * 1e-20
                    x = x + r * 1e-20
                v = acc
            elif variant == "sub_min_128x1024":
                x = wide_ref[...] + dep1024
                r = jnp.min(x, axis=0, keepdims=True)  # (1, 1024)
                v = v + r[0:1, 0:128] * 1e-20
            elif variant == "sub_min_128x1024_x5":
                x = wide_ref[...] + dep1024
                acc = v
                for _ in range(5):
                    r = jnp.min(x, axis=0, keepdims=True)
                    acc = acc + r[0:1, 0:128] * 1e-20
                    x = x + r * 1e-20
                v = acc
            elif variant == "cmp6_128x1024":
                x = wide_ref[...] + dep1024
                m = (x > 0.0) & (x > -1.0) & (x > -2.0) & (x < 1e9) & (x != 0.5) & (x < 2e9)
                v = v + jnp.where(m, x, 2.0)[0:8, 0:128] * 1e-20
            elif variant == "cmp6_1024x128":
                x = big_ref[...] + dep128
                m = (x > 0.0) & (x > -1.0) & (x > -2.0) & (x < 1e9) & (x != 0.5) & (x < 2e9)
                v = v + jnp.where(m, x, 2.0)[0:8, :] * 1e-20
            elif variant == "depth_pass_128x1024":
                # one pass-iteration of the pair-major depth test, 1 sample:
                # 3 edge cmps + z cmp vs broadcast row + sublane zmin
                x = wide_ref[...] + dep1024
                zrow = x[0:1, :]
                passed = (x >= 0) & (x > -1.0) & (x > -2.0) & (x <= zrow) & (x >= -3.0)
                zmin = jnp.min(jnp.where(passed, x, 2.0), axis=0, keepdims=True)
                v = v + zmin[0:1, 0:128] * 1e-20
            elif variant == "reshape_1x1024_to_8x128":
                r = rhs_ref[0:1, :] + dep1024  # (1, 1024)
                p = r.reshape(8, 128)
                v = v + p * 1e-20
            elif variant == "reshape_8x1024_to_64x128":
                r = rhs_ref[...] + dep1024
                p = r.reshape(64, 128)
                v = v + p[0:8, :] * 1e-20
            elif variant == "onehot_resolve_1024":
                oh = big_ref[...] + dep128  # stand-in one-hot (1024, 128)
                cols = wide_ref[:, 0:24]
                e = jax.lax.dot_general(
                    oh, cols, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                v = v + jnp.pad(e[0:8, 0:24], ((0, 0), (0, 104))) * 1e-20
            elif variant == "col_ops8_1024x1":
                c = (big_ref[...] + dep128)[:, 0:1]
                for _ in range(8):
                    c = c * 1.000001 + 1e-9
                v = v + c[0:8, :] * 1e-20
            elif variant == "row_ops8_1x1024":
                r = (rhs_ref[...] + dep1024)[0:1, :]
                for _ in range(8):
                    r = r * 1.000001 + 1e-9
                v = v + r[0:1, 0:128] * 1e-20
            elif variant == "full_ops8_1024x128":
                x = big_ref[...] + dep128
                for _ in range(8):
                    x = x * 1.000001 + 1e-9
                v = v + x[0:8, :] * 1e-20
            elif variant == "full_ops8_128x1024":
                x = wide_ref[...] + dep1024
                for _ in range(8):
                    x = x * 1.000001 + 1e-9
                v = v + x[0:8, 0:128] * 1e-20
            elif variant == "int_keypack_128x1024":
                x = wide_ref[...] + dep1024
                zq = jnp.clip(x * 262144.0, 0.0, 262143.0).astype(jnp.int32)
                key = (zq << 13) | 1234
                kmin = jnp.min(key, axis=0, keepdims=True)
                v = v + kmin[0:1, 0:128].astype(jnp.float32) * 1e-20
            else:
                raise ValueError(variant)
            return v

        out = jax.lax.fori_loop(0, n_iter, body, big_ref[0:8, :] * 1.0)
        out_ref[0, 0] = jnp.sum(out)

    return kernel


def run(variant, n1=10000, n2=110000):
    key = jax.random.PRNGKey(0)
    lhs = jax.random.normal(key, (1024, 8))
    rhs = jax.random.normal(key, (8, 1024))
    big = jax.random.normal(key, (1024, 128))
    wide = jax.random.normal(key, (128, 1024))
    times = {}
    for n in (n1, n2):
        f = pl.pallas_call(
            make_kernel(variant, n),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )
        fj = jax.jit(f)
        float(fj(lhs, rhs, big, wide)[0, 0])  # warm
        best = 1e9
        for r in range(3):
            t0 = time.time()
            float(fj(lhs, rhs, big + r * 1e-6, wide)[0, 0])
            best = min(best, time.time() - t0)
        times[n] = best
    per_iter = (times[n2] - times[n1]) / (n2 - n1)
    print(f"{variant:28s}: {per_iter*1e9:9.1f} ns/iter", flush=True)
    return per_iter


if __name__ == "__main__":
    variants = sys.argv[1:] or [
        "mm_1024x8x512", "mm_1024x8x512_x5", "mm_512x8x1024",
        "mm_512x8x1024_x5", "mm_896x8x1024",
        "lane_min_1024x128", "lane_min_1024x128_x5",
        "sub_min_128x1024", "sub_min_128x1024_x5",
        "cmp6_128x1024", "cmp6_1024x128", "depth_pass_128x1024",
        "reshape_1x1024_to_8x128", "reshape_8x1024_to_64x128",
        "onehot_resolve_1024",
        "col_ops8_1024x1", "row_ops8_1x1024",
        "full_ops8_1024x128", "full_ops8_128x1024",
        "int_keypack_128x1024",
    ]
    for v in variants:
        try:
            run(v)
        except Exception as e:
            print(f"{v}: FAILED {str(e)[:160]}")
