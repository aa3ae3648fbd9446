"""Probe: which batched-gather formulation is fast on this TPU?

out[b, k] = tbl[b, idx[b, k]]  with tbl (B, L) uint32, idx (B, K) int32.

Variants:
  v_tala   : jnp.take_along_axis(tbl, idx, axis=1)        (current)
  v_flat   : jnp.take(tbl.reshape(-1), b*L + idx)
  v_onehot : one-hot (B,K,L) bf16 matmul (small L only)
  v_gather : lax.gather with operand_batching_dims
  v_dsloop : scan over K-chunks of dynamic_slice  (expected slow)
Also sweeps chain depth to split fixed-vs-per-op cost.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def mk(B, L, K, seed=0):
    rng = np.random.RandomState(seed)
    tbl = jnp.asarray(rng.randint(0, 2**31, (B, L), dtype=np.int32))
    idx = jnp.asarray(rng.randint(0, L, (B, K), dtype=np.int32))
    return tbl, idx


def timeit(name, fn, tbl, idx, depth, reps=10):
    f = jax.jit(functools.partial(fn, depth=depth))
    ref = np.asarray(jax.jit(functools.partial(v_tala, depth=depth))(tbl, idx))
    out = np.asarray(f(tbl, idx))
    ok = np.array_equal(out, ref)
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(f(tbl, idx))
    dt = (time.perf_counter() - t0) / reps
    B, L = tbl.shape
    K = idx.shape[1]
    print(f"{name:10s} B={B:<4d} L={L:<7d} K={K:<5d} depth={depth:<3d}: "
          f"{dt*1e3:8.2f} ms total, {dt/depth*1e6:9.1f} us/gather ok={ok}",
          flush=True)


def v_tala(tbl, idx, depth):
    L = tbl.shape[1]
    acc = jnp.zeros(idx.shape, tbl.dtype)
    for i in range(depth):
        acc = acc + jnp.take_along_axis(tbl, (idx + i) % L, axis=1)
    return acc


def v_flat(tbl, idx, depth):
    B, L = tbl.shape
    flat = tbl.reshape(-1)
    base = (jnp.arange(B, dtype=jnp.int32) * L)[:, None]
    acc = jnp.zeros(idx.shape, tbl.dtype)
    for i in range(depth):
        acc = acc + jnp.take(flat, base + (idx + i) % L)
    return acc


def v_onehot(tbl, idx, depth):
    B, L = tbl.shape
    acc = jnp.zeros(idx.shape, jnp.int32)
    cols = jnp.arange(L, dtype=jnp.int32)
    tb = tbl.astype(jnp.float32)
    for i in range(depth):
        oh = ((idx + i) % L)[:, :, None] == cols[None, None, :]
        acc = acc + jnp.einsum(
            "bkl,bl->bk", oh.astype(jnp.bfloat16), tb.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32).astype(jnp.int32)
    return acc


def v_gather(tbl, idx, depth):
    B, L = tbl.shape
    K = idx.shape[1]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    acc = jnp.zeros(idx.shape, tbl.dtype)
    for i in range(depth):
        ii = ((idx + i) % L)[:, :, None]
        acc = acc + jax.lax.gather(
            tbl, ii, dn, slice_sizes=(1, 1), mode="clip")
    return acc


if __name__ == "__main__":
    for B, L, K in [(4, 131072, 512), (64, 1024, 512)]:
        tbl, idx = mk(B, L, K)
        for depth in (1, 8, 64):
            timeit("tala", v_tala, tbl, idx, depth)
            timeit("flat", v_flat, tbl, idx, depth)
            timeit("gather", v_gather, tbl, idx, depth)
            if L <= 2048:
                timeit("onehot", v_onehot, tbl, idx, depth)
