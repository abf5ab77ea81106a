"""Standalone bloom sub-stage microbench at 1080p (channel-first)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from reze_tpu.render import post

H, W = 1080, 1920
x0 = jnp.asarray(np.random.default_rng(0).random((3, H, W), np.float32))

def timeit(name, f, n=20):
    g = jax.jit(f)
    jax.block_until_ready(g(x0))
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        for _ in range(n):
            r = g(x0)
        jax.block_until_ready(r)
        best = min(best, (time.time() - t0) / n)
    print(f"{name:28s} {best*1e3:7.3f} ms", flush=True)

timeit("noop scale", lambda x: x * 1.0001)
timeit("downsample2x_cf", lambda x: post.downsample2x_cf(x))
timeit("down+extract", lambda x: post.extract(post.downsample2x_cf(x), 0.3))
timeit("down+extract+blur", lambda x: post._blur_axis(post._blur_axis(
    post.extract(post.downsample2x_cf(x), 0.3), 2), 1))
timeit("up2_cf(half)", lambda x: post._up2_axis_cf(post._up2_axis_cf(
    post.downsample2x_cf(x), 1), 2))
timeit("full apply_bloom_cf", lambda x: post.apply_bloom_cf(x, 0.3, 0.12))
