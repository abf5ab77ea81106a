"""Calibration: known-cost ops (matmul FLOPs, HBM-bound elementwise) to
validate the timing harness, then the real albedo gather both ways."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

P = 2_088_960
N = 20


def timeit(name, f, *a, expect=None):
    out = jax.block_until_ready(f(*a))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = jax.block_until_ready(f(*a))
        best = min(best, (time.time() - t0) / N * 1000)
    ex = f" (expect ~{expect})" if expect else ""
    print(f"{name}: {best:.3f} ms/iter{ex}", flush=True)
    return out


key = jax.random.PRNGKey(0)

# 1. matmul calibration: 2048^3 f32 = 17.2 GFLOP/iter; v5e f32 ~ 49 TFLOPs
a = jax.random.normal(key, (2048, 2048))


def mm_chain(a):
    def body(c, _):
        return jnp.tanh(c @ a), None

    out, _ = jax.lax.scan(body, a, None, length=N)
    return out


timeit("matmul 2048^3 f32 chained", jax.jit(mm_chain), a, expect="0.4-1ms")

# 2. HBM elementwise calibration: (P,3) f32 = 25MB read + 25MB write / iter
img = jax.random.normal(key, (P, 3))


def ew_chain(x):
    def body(c, _):
        return jnp.sin(c) * 1.0001 + 1e-6, None

    out, _ = jax.lax.scan(body, x, None, length=N)
    return out


timeit("sin elementwise (P,3) chained", jax.jit(ew_chain), img, expect=">=0.06ms")

# 3. albedo gather: real atlas-shaped table, c-dependent indices
tab = jnp.asarray(np.random.randint(0, 255, (20 << 20, 4), np.uint8))
idx = jax.random.randint(key, (P,), 0, 20 << 20, jnp.int32)
vals = jax.random.normal(key, (P,))


def gather_chain(vals, tab, idx):
    def body(c, _):
        i = (idx + jnp.abs(c * 1e6).astype(jnp.int32)) % (20 << 20)
        tex = tab[i].astype(jnp.float32)
        c2 = c + tex[:, 0] * 1e-9 + tex[:, 3] * 1e-12
        return c2, None

    out, _ = jax.lax.scan(body, vals, None, length=N)
    return out


timeit("gather u8x4 (P idx) chained", jax.jit(gather_chain), vals, tab, idx)

# 4. the EXACT profile albedo gather, 20 independent dispatches
from reze_tpu.core.build import load_model
from reze_tpu.core.types import EngineConfig
from reze_tpu.render import shading_fast as SF

built = load_model("/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx", EngineConfig())
m = built.arrays
packed = SF.pack_materials(m.materials, m.atlas)
atlas_stride = m.atlas.texels.shape[2]
u = jax.random.uniform(key, (P,)) * 4.0
v = jax.random.uniform(key, (P,)) * 4.0
params = SF.fetch_params(jnp.zeros((P,)), packed)


def albedo(u, v, params):
    tex_id = params[:, 1]
    h = jnp.maximum(params[:, 2], 1.0)
    w = jnp.maximum(params[:, 3], 1.0)
    base = params[:, 4]
    x = jnp.clip(jnp.floor(jnp.mod(u, 1.0) * w), 0.0, w - 1.0)
    y = jnp.clip(jnp.floor(jnp.mod(v, 1.0) * h), 0.0, h - 1.0)
    i = (base + y * atlas_stride + x).astype(jnp.int32)
    texel = packed.atlas_flat[i].astype(jnp.float32) * (1.0 / 255.0)
    return jnp.where(tex_id[:, None] >= 0.0, texel[:, :3], 1.0)


f = jax.jit(albedo)
out = jax.block_until_ready(f(u, v, params))
t0 = time.time()
for _ in range(N):
    out = f(u, v, params)
jax.block_until_ready(out)
print(f"profile-style albedo gather, 20 async dispatches: {(time.time()-t0)/N*1000:.3f} ms/iter")


# 5. same albedo op chained in one jit
def albedo_chain(u, v, params):
    def body(c, _):
        out = albedo(u + c * 1e-7, v, params)
        return c + out[:, 0] * 1e-9, None

    out, _ = jax.lax.scan(body, jnp.zeros((P,)), None, length=N)
    return out


timeit("profile-style albedo gather chained", jax.jit(albedo_chain), u, v, params)
