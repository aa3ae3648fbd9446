#!/usr/bin/env python
"""Kernel/pipeline microbenchmarks (run on the real TPU).

Sync discipline: `jax.block_until_ready` does NOT force execution over
the axon driver tunnel — every timing here syncs with a small
`np.asarray(...)` fetch. Host-side speed on this VM swings +/-40%
between minutes; only same-run A/B comparisons are meaningful.

Usage: python scripts/microbench.py [forward|fused|traceback|pipeline|all]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _batch(B=2048, L=1000, l_pad=1024, div=0.04, seed=23):
    rng = np.random.RandomState(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    qlens = rng.randint(L // 2, L + 1, B).astype(np.int32)
    tlens = (qlens + rng.randint(-6, 7, B)).clip(8, l_pad).astype(np.int32)
    qs = np.zeros((B, l_pad), np.uint8)
    ts = np.zeros((B, l_pad), np.uint8)
    for b in range(B):
        q = rng.choice(bases, qlens[b])
        t = q[: tlens[b]].copy() if tlens[b] <= qlens[b] else np.concatenate(
            [q, rng.choice(bases, tlens[b] - qlens[b])]
        )
        mut = rng.rand(tlens[b]) < div
        t[mut] = rng.choice(bases, mut.sum())
        qs[b, : qlens[b]] = q
        ts[b, : tlens[b]] = t
    return qs, ts, qlens, tlens


def _best(f, reps=3):
    f()  # warm/compile
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_forward():
    import jax.numpy as jnp

    from allwave_tpu.core.scores import parse_scores
    from allwave_tpu.wfa import pallas_dense as P
    from allwave_tpu.wfa.params import resolve_penalties

    pen = resolve_penalties(parse_scores("0,5,8,2,24,1"))
    B, l_pad = 2048, 1024
    args = tuple(map(jnp.asarray, _batch(B=B, l_pad=l_pad)))
    for K in (128, 256, 512):
        dt = _best(
            lambda: np.asarray(
                P.dense_forward_pallas(*args, pen, K, l_pad, False)[0]
            )
        )
        path = (
            "t" if P.uses_transposed_planes(K)
            else "c2" if P.uses_compressed_planes(K) else "full"
        )
        print(f"forward  K={K:4d} ({path}): {dt*1000:6.1f} ms  {B/dt:7.0f} pairs/s")


def bench_fused():
    import jax.numpy as jnp

    from allwave_tpu.core.scores import parse_scores
    from allwave_tpu.wfa import dense as D
    from allwave_tpu.wfa.params import resolve_penalties

    pen = resolve_penalties(parse_scores("0,5,8,2,24,1"))
    B, l_pad = 2048, 1024
    args = tuple(map(jnp.asarray, _batch(B=B, l_pad=l_pad)))
    for K in (128, 256):
        dt = _best(
            lambda: np.asarray(
                D.dense_align(*args, pen, K, l_pad, 256, "pallas")[0]
            )
        )
        print(f"fused    K={K:4d}: {dt*1000:6.1f} ms  {B/dt:7.0f} pairs/s")


def bench_traceback():
    import jax.numpy as jnp

    from allwave_tpu.core.scores import parse_scores
    from allwave_tpu.wfa import dense as D
    from allwave_tpu.wfa import pallas_dense as P
    from allwave_tpu.wfa.params import resolve_penalties

    pen = resolve_penalties(parse_scores("0,5,8,2,24,1"))
    B, l_pad, K = 2048, 1024, 256
    args = tuple(map(jnp.asarray, _batch(B=B, l_pad=l_pad)))
    s, c, ch = P.dense_forward_pallas(*args, pen, K, l_pad, True)
    s = jnp.asarray(np.asarray(s))
    comp = P.uses_compressed_planes(K)
    tr = P.uses_transposed_planes(K)
    dt = _best(
        lambda: np.asarray(
            D.dense_traceback(
                ch, s, args[2], args[3], pen, 256, k_width=K,
                compressed=comp, transposed=tr,
            )[2]
        )
    )
    print(f"traceback K={K}: {dt*1000:6.1f} ms")


def bench_pipeline():
    from allwave_tpu.core.scores import parse_scores
    from allwave_tpu.core.types import NoSparsification
    from allwave_tpu.engine.pipeline import AllPairAligner
    from allwave_tpu.testing.synth import MutationConfig, make_test_case

    cfg = MutationConfig(
        snp_rate=0.02, insertion_rate=0.0005, deletion_rate=0.0005
    )
    case = make_test_case(seed=1234, n_sequences=128, length=1000, cfg=cfg)
    params = parse_scores("0,5,8,2,24,1")

    def run():
        al = AllPairAligner(
            case.sequences,
            params,
            exclude_self=True,
            use_mash_orientation=True,
            sparsification=NoSparsification(),
        )
        out = []
        al.for_each_with_callback(out.append)
        return out

    dt = _best(run)
    n = 128 * 127
    print(f"pipeline n=128x1kb: {dt:.3f} s  {n/dt:.0f} aln/s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("forward", "all"):
        bench_forward()
    if which in ("fused", "all"):
        bench_fused()
    if which in ("traceback", "all"):
        bench_traceback()
    if which in ("pipeline", "all"):
        bench_pipeline()
