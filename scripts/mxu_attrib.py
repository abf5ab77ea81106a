"""Attribute the integrated-MXU chunk cost: prototype + DMA + state refs."""
import functools, os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_PX, CHUNK = 1024, 128

def make(variant, n_chunks):
    def kernel(quad_hbm, pair_hbm, pxy_ref, out_ref, state_ref, bufq, bufp, semq, semp):
        state_ref[...] = jnp.ones_like(state_ref)
        pxys = [pxy_ref[:, 8*s:8*s+8] for s in range(5)]
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, CHUNK), 1)[0:1, :]

        def dmaq(slot, ci):
            return pltpu.make_async_copy(quad_hbm.at[:, pl.ds((ci % 64) * 512, 512)], bufq.at[slot], semq.at[slot])
        def dmap(slot, ci):
            return pltpu.make_async_copy(pair_hbm.at[pl.ds((ci % 64) * CHUNK, CHUNK), :], bufp.at[slot], semp.at[slot])
        dmaq(0, 0).start(); dmap(0, 0).start()

        def body(ci, acc):
            slot = jax.lax.rem(ci, 2)
            @pl.when(ci + 1 < n_chunks)
            def _():
                dmaq(jax.lax.rem(ci+1,2), ci+1).start(); dmap(jax.lax.rem(ci+1,2), ci+1).start()
            dmaq(slot, ci).wait(); dmap(slot, ci).wait()

            def use(q, p_):
                quad = q[...]
                res = acc
                if variant in ("planes", "planes_state", "full"):
                    selz = (jax.lax.broadcasted_iota(jnp.int32, (8, 512), 1) // CHUNK
                            == jax.lax.broadcasted_iota(jnp.int32, (8, 512), 0)).astype(jnp.float32)[0:4, :]
                    zb_all = jnp.dot(state_ref[:, 0:4], selz, preferred_element_type=jnp.float32)
                    for s in range(4):
                        E = jnp.dot(pxys[s], quad, preferred_element_type=jnp.float32)
                        e0, e1, e2, zz = E[:, 0:128], E[:, 128:256], E[:, 256:384], E[:, 384:512]
                        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
                        zbs = zb_all[:, s*128:(s+1)*128]
                        passed = inside & (zz <= zbs) & (zz >= 0) & (zz <= 1)
                        zmin = jnp.min(jnp.where(passed, zz, 2.0), axis=1, keepdims=True)
                        if variant in ("planes_state", "full"):
                            state_ref[:, s:s+1] = jnp.minimum(state_ref[:, s:s+1], zmin)
                            state_ref[:, 4+s:5+s] = jnp.maximum(state_ref[:, 4+s:5+s], (zmin < 2.0).astype(jnp.float32))
                        else:
                            res = res + jnp.sum(zmin) * 1e-12
                if variant == "full":
                    E = jnp.dot(pxys[4], quad, preferred_element_type=jnp.float32)
                    zc = E[:, 384:512]
                    zq = jnp.clip(zc * 262144.0, 0, 262143.0).astype(jnp.int32)
                    key = (zq << 13) | (8191 - (ci * 0 + lane))
                    key = jnp.where((E[:, 0:128] >= 0), key, jnp.int32(2**31 - 1))
                    kmin = jnp.min(key, axis=1, keepdims=True)
                    best = pltpu.bitcast(state_ref[:, 8:9], jnp.int32)
                    nb = jnp.minimum(best, kmin)
                    state_ref[:, 8:9] = pltpu.bitcast(nb, jnp.float32)
                    local = (8191 - (nb & 8191))
                    oh = (jnp.dot(local.astype(jnp.float32), jnp.ones((1, 128))) == lane.astype(jnp.float32))
                    frag = jax.lax.dot_general(oh.astype(jnp.float32), p_[...][:, 14:37], (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
                    wb = jnp.dot(((local >= 0) & (local < 128)).astype(jnp.float32), jnp.ones((1, 128)))[:, :23]
                    state_ref[:, 16:39] = frag * wb + state_ref[:, 16:39] * (1 - wb)
                return res

            @pl.when(slot == 0)
            def _(): pass
            r0 = use(bufq.at[0], bufp.at[0])
            return r0

        out = jax.lax.fori_loop(0, n_chunks, body, jnp.float32(0.0))
        out_ref[0, 0] = out + jnp.sum(state_ref[:, 0:1])
    return kernel

def run(variant):
    quad = jnp.asarray(np.random.uniform(0, 0.1, (8, 64*512)).astype(np.float32))
    pair = jnp.asarray(np.random.uniform(0, 1, (64*CHUNK, 128)).astype(np.float32))
    pxy = np.zeros((N_PX, 48), np.float32)
    ii = np.arange(N_PX)
    for si in range(5):
        pxy[:, 8*si] = ii % 128 + 0.5; pxy[:, 8*si+1] = ii // 128 + 0.5; pxy[:, 8*si+2] = 1.0
    pxy = jnp.asarray(pxy)
    ts = {}
    for n in (100, 1100):
        f = pl.pallas_call(
            make(variant, n),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.VMEM((N_PX, 128), jnp.float32),
                            pltpu.VMEM((2, 8, 512), jnp.float32),
                            pltpu.VMEM((2, CHUNK, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))],
        )
        fj = jax.jit(lambda q, p_, x: f(q, p_, x))
        float(fj(quad, pair, pxy)[0, 0])
        best = 1e9
        for r in range(3):
            t0 = time.time(); float(fj(quad + r*1e-9, pair, pxy)[0, 0]); best = min(best, time.time()-t0)
        ts[n] = best
    per = (ts[1100] - ts[100]) / 1000
    print(f"{variant:14s}: {per*1e6:7.2f} us/chunk = {per/CHUNK*1e9:5.0f} ns/pair")

for v in ["dma_only", "planes", "planes_state", "full"]:
    run(v)
