"""Prototype: MXU-based rasterization chunk — measure ns/pair.

Tile (8, 128) = 1024 px. Chunk = 128 pairs, coefficients transposed
(coeff, pair). Edge/depth planes evaluate as (1024, K) @ (K, 128) matmuls;
depth test + winner via lane reductions. This is the candidate inner loop
for the frame megakernel; measure before integrating.
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
N_SAMPLES = 4
SAMPLE_OFFSETS = [(-0.125, -0.375), (0.375, -0.125), (-0.375, 0.125), (0.125, 0.375)]


def kernel(co_ref, pxy_ref, out_ref, zbuf_ref, best_ref, *, n_chunks):
    """co_ref: (16, CHUNK) coefficient rows; pxy_ref: (5, 1024, 8) sample
    pixel matrices (computed in XLA; per-tile offsets fold in as a (1, CHUNK)
    sublane-broadcast row in the real kernel)."""
    zbuf_ref[...] = jnp.ones_like(zbuf_ref)
    best_ref[...] = jnp.full_like(best_ref, 2.0)
    pxys = [pxy_ref[s] for s in range(N_SAMPLES + 1)]

    co = co_ref[...]  # (16, CHUNK)
    e_mats = []  # per-edge (8, CHUNK) coefficient blocks [a; b; c; pad..]
    for e in range(4):  # e0, e1, e2, z
        rows = co[3 * e:3 * e + 3, :]
        e_mats.append(jnp.concatenate([rows, jnp.zeros((5, CHUNK))], axis=0))

    def chunk_body(ci, carry):
        zmin_all, wonacc = carry
        # edge/depth planes for all samples: matmuls (1024,8)@(8,128)
        best = best_ref[...]  # (1024, 1) packed best z
        z_acc = None
        won = wonacc
        for s in range(N_SAMPLES):
            e0 = jnp.dot(pxys[s], e_mats[0], preferred_element_type=jnp.float32)
            e1 = jnp.dot(pxys[s], e_mats[1], preferred_element_type=jnp.float32)
            e2 = jnp.dot(pxys[s], e_mats[2], preferred_element_type=jnp.float32)
            zz = jnp.dot(pxys[s], e_mats[3], preferred_element_type=jnp.float32)
            inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
            zb = jnp.dot(zbuf_ref[:, s:s + 1], jnp.ones((1, CHUNK)),
                         preferred_element_type=jnp.float32)
            passed = inside & (zz <= zb) & (zz >= 0.0) & (zz <= 1.0)
            zmin_s = jnp.min(jnp.where(passed, zz, 2.0), axis=1, keepdims=True)
            zbuf_ref[:, s:s + 1] = jnp.minimum(zbuf_ref[:, s:s + 1], zmin_s)
            won = won + jnp.where(zmin_s < 2.0, float(2 ** s), 0.0) * (ci + 1.0) * 1e-9
            z_acc = zmin_s if z_acc is None else jnp.minimum(z_acc, zmin_s)

        # winner (center): packed z*CHUNK + lane-id min-reduce
        ec = jnp.dot(pxys[4], e_mats[0], preferred_element_type=jnp.float32)
        zc = jnp.dot(pxys[4], e_mats[3], preferred_element_type=jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, CHUNK), 1).astype(jnp.float32)[0:1, :]
        key = jnp.where(ec >= 0, zc * 256.0 + (255.0 - lane), 1e9)
        kmin = jnp.min(key, axis=1, keepdims=True)
        best_ref[...] = jnp.minimum(best, kmin)
        return (jnp.minimum(zmin_all, z_acc), won)

    out = jax.lax.fori_loop(
        0, n_chunks, chunk_body,
        (jnp.full((N_PX, 1), 2.0), jnp.zeros((N_PX, 1))),
    )
    out_ref[0, 0] = jnp.sum(out[0]) + jnp.sum(out[1]) + jnp.sum(best_ref[...])


def run(n_chunks):
    co = jax.random.uniform(jax.random.PRNGKey(0), (16, CHUNK)) * 0.1

    f = pl.pallas_call(
        functools.partial(kernel, n_chunks=n_chunks),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((N_PX, N_SAMPLES), jnp.float32),
            pltpu.VMEM((N_PX, 1), jnp.float32),
        ],
    )
    import numpy as _np
    ii = _np.arange(N_PX)
    pxy = _np.zeros((5, N_PX, 8), _np.float32)
    for si in range(5):
        dx, dy = SAMPLE_OFFSETS[si] if si < 4 else (0.0, 0.0)
        pxy[si, :, 0] = ii % 128 + 0.5 + dx
        pxy[si, :, 1] = ii // 128 + 0.5 + dy
        pxy[si, :, 2] = 1.0
    pxy = jnp.asarray(pxy)
    fj = jax.jit(lambda x: f(x, pxy))
    float(fj(co)[0, 0])
    best = 1e9
    for r in range(3):
        t0 = time.time()
        float(fj(co + r * 1e-7)[0, 0])
        best = min(best, time.time() - t0)
    return best


t1 = run(200)
t2 = run(2200)
per_chunk = (t2 - t1) / 2000
print(f"per chunk (128 pairs, 1024 px, 4+1 samples): {per_chunk*1e6:.2f} us")
print(f"-> {per_chunk/CHUNK*1e9:.0f} ns/pair")
