"""Microbench: 1M-index albedo-style gathers on the real chip.

Forms: (a) row gather from (N,4) u8  (b) scalar gather from (N,) u32 view
       (c) scalar gather from (N,) f32  (d) 4x u8 scalar gathers
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

N = 1 << 22          # 4M texels (16 MB as u32)
P = 1 << 20          # 1M indices
rng = np.random.default_rng(0)
tex8 = jnp.asarray(rng.integers(0, 255, (N, 4), np.uint8))
tex32 = jax.lax.bitcast_convert_type(tex8, jnp.uint32).reshape(N)
texf = jax.lax.bitcast_convert_type(tex8, jnp.float32).reshape(N)
idx0 = jnp.asarray(rng.integers(0, N, (P,), np.int32))

def timeit(name, f):
    g = jax.jit(f)
    r = g(idx0); jax.block_until_ready(r)
    best = 1e9
    for rep in range(5):
        t0 = time.time()
        jax.block_until_ready(g(idx0))
        best = min(best, time.time() - t0)
    print(f"{name:24s} {best*1e3:8.3f} ms  ({best/P*1e9:.2f} ns/idx)", flush=True)

def loop(body, n=8):
    def f(idx):
        def it(c, _):
            s, ix = c
            v = body(ix)
            return (s + v, (ix + 1) & (N - 1)), None
        (s, _), _ = jax.lax.scan(it, (jnp.float32(0), idx), None, length=n)
        return s
    return f

timeit("row (N,4)u8", loop(lambda ix: tex8[ix].astype(jnp.float32).sum() * 1e-9))
timeit("scalar u32", loop(lambda ix: tex32[ix].astype(jnp.float32).sum() * 1e-9))
timeit("scalar f32", loop(lambda ix: texf[ix].sum() * 1e-9))
timeit("take u32", loop(lambda ix: jnp.take(tex32, ix).astype(jnp.float32).sum() * 1e-9))
