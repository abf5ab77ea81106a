"""Trustworthy TPU timing harness for this sandbox.

Artifacts that make naive timing lie here:
  1. repeated identical (executable, args) calls can be served from a result
     cache — every timed call must receive a fresh seed that feeds the math;
  2. `block_until_ready` does NOT await device completion through the axon
     tunnel — only a host readback does;
  3. per-call sync overhead is ~60 ms with ~±5 ms noise — per-iter cost must
     come from a scan-length delta large enough to dominate the noise.

bench_op chains `op` inside lax.scan at two lengths (default 4 vs 104) and
reports (T_long - T_short) / (len_long - len_short).
"""

import time

import jax
import jax.numpy as jnp


def _make_runner(op, length):
    def run(seed, carry, *consts):
        leaves, treedef = jax.tree.flatten(carry)
        leaves = [leaves[0] + seed.astype(leaves[0].dtype)] + leaves[1:]
        carry = jax.tree.unflatten(treedef, leaves)

        def body(c, _):
            return op(c, *consts), None

        out, _ = jax.lax.scan(body, carry, None, length=length)
        return out

    return jax.jit(run)


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def bench_op(name, op, init_carry, *consts, n1=4, n2=104, reps=3, quiet=False):
    """op(carry, *consts) -> carry, chained in a lax.scan. Returns ms/iter.

    `op` must be genuinely carry-dependent or XLA will collapse the scan.
    """
    times = {}
    for length in (n1, n2):
        f = _make_runner(op, length)
        _sync(f(jnp.float32(0.5), init_carry, *consts))  # warm + ship consts
        best = 1e9
        for r in range(reps):
            seed = jnp.float32((r + 1) * 1e-6)
            t0 = time.time()
            _sync(f(seed, init_carry, *consts))
            best = min(best, time.time() - t0)
        times[length] = best
    per_iter = (times[n2] - times[n1]) / (n2 - n1) * 1000
    if not quiet:
        print(f"{name}: {per_iter:.3f} ms/iter  (call n={n1}: {times[n1]*1000:.1f} ms, "
              f"n={n2}: {times[n2]*1000:.1f} ms)", flush=True)
    return per_iter
