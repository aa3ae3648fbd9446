"""Probe: wavefront-sweep (wf_span) cost scaling on TPU — B, K, L — plus
the raw gather cost of take_along_axis((B,L) table, (B,K) idx) that the
extension loop issues per iteration.

Usage: python scripts/kexp4.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from allwave_tpu.core.scores import parse_scores
from allwave_tpu.wfa.params import resolve_penalties
from allwave_tpu.wfa import wf_segmented as W


def _pairs(B, L, div=0.0025, seed=7):
    rng = np.random.RandomState(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    qs = np.zeros((B, L), np.uint8)
    ts = np.zeros((B, L), np.uint8)
    for b in range(B):
        q = rng.choice(bases, L)
        t = q.copy()
        nmut = int(div * L)
        pos = rng.choice(L, nmut, replace=False)
        t[pos] = rng.choice(bases, nmut)
        qs[b], ts[b] = q, t
    qlens = np.full(B, L, np.int32)
    tlens = np.full(B, L, np.int32)
    return qs, ts, qlens, tlens


def time_sweep(B, L, K, C=256, reps=2):
    pen = resolve_penalties(parse_scores("0,5,8,2,24,1"))
    qs, ts, qlens, tlens = _pairs(B, L)
    qs, ts = jnp.asarray(qs), jnp.asarray(ts)
    qlens, tlens = jnp.asarray(qlens), jnp.asarray(tlens)
    mmw, nxw, ks, h_max, c_end, feasible, buf, done, scores = W.wf_init(
        qs, ts, qlens, tlens, pen, K
    )
    # warm (compile)
    out = W.wf_span(
        mmw, nxw, ks, h_max, c_end, tlens, feasible, jnp.int32(0), buf, done,
        scores, pen=pen, n_steps=C, with_history=False,
    )
    np.asarray(out[2])
    t0 = time.perf_counter()
    for r in range(reps):
        out = W.wf_span(
            mmw, nxw, ks, h_max, c_end, tlens, feasible, jnp.int32(0), buf,
            done, scores, pen=pen, n_steps=C, with_history=False,
        )
        np.asarray(out[2])
    dt = (time.perf_counter() - t0) / reps
    print(f"wf_span  B={B:<4d} L={L:<7d} K={K:<5d} C={C}: {dt*1e3:9.1f} ms "
          f"({dt/C*1e3:7.3f} ms/score-step)", flush=True)
    return dt


def time_gather(B, L, K, reps=20):
    rng = np.random.RandomState(3)
    tbl = jnp.asarray(rng.randint(0, 2**31, (B, L), dtype=np.int32).view(np.uint32))
    idx = jnp.asarray(rng.randint(0, L, (B, K), dtype=np.int32))

    @jax.jit
    def g(tbl, idx):
        # chain a few gathers so per-call overhead amortizes
        acc = jnp.zeros_like(idx, dtype=jnp.uint32)
        for i in range(8):
            acc = acc + jnp.take_along_axis(tbl, (idx + i) % L, axis=1)
        return acc

    np.asarray(g(tbl, idx))
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(g(tbl, idx))
    dt = (time.perf_counter() - t0) / reps / 8
    print(f"gather   B={B:<4d} L={L:<7d} K={K:<5d}: {dt*1e6:9.1f} us/gather",
          flush=True)
    return dt


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("gather", "all"):
        for B, L, K in [(1, 131072, 512), (4, 131072, 512), (16, 131072, 512),
                        (4, 131072, 2048), (4, 8192, 512), (64, 1024, 512)]:
            time_gather(B, L, K)
    if mode in ("sweep", "all"):
        for B, L, K in [(1, 131072, 512), (4, 131072, 512), (4, 131072, 1024)]:
            time_sweep(B, L, K)
