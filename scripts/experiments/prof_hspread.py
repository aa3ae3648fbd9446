"""Wavefront frontier statistics on the bench 5b workload (100 kb @
~0.25% divergence, seed 18) — sizes the windowed-extension Pallas
kernel:

  1. per-level h-advance per lane (window refill rate),
  2. per-level h-SPREAD within blocks of 8/16/32 adjacent diagonals
     (whether adjacent diagonals can share one bitmap window base),
  3. active-lane range per level (triangle clipping payoff).

Run on the TPU: PYTHONPATH=/root/repo python scripts/prof_hspread.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from allwave_tpu.core.scores import parse_scores
from allwave_tpu.testing.synth import MutationConfig, make_test_case
from allwave_tpu.wfa.params import resolve_penalties
from allwave_tpu.wfa import wf_segmented as W

pen = resolve_penalties(parse_scores("0,5,8,2,24,1"))
cfg5b = MutationConfig(snp_rate=0.0025, insertion_rate=0.0001, deletion_rate=0.0001)
case = make_test_case(seed=18, n_sequences=4, length=100_000, cfg=cfg5b)
seqs = [s.seq for s in case.sequences]
pairs = [(q, t) for q in seqs for t in seqs if q is not t]
print(f"{len(pairs)} pairs")

K = 4096
C = 256
N_SEG = int(os.environ.get("SEGS", "14"))
B = 16
l_pad = 131072
qs = np.zeros((B, l_pad), np.uint8)
ts = np.zeros((B, l_pad), np.uint8)
qlens = np.zeros((B,), np.int32)
tlens = np.zeros((B,), np.int32)
for j, (q, t) in enumerate(pairs):
    qs[j, : len(q)] = np.frombuffer(q, dtype=np.uint8)
    ts[j, : len(t)] = np.frombuffer(t, dtype=np.uint8)
    qlens[j] = len(q)
    tlens[j] = len(t)

t0 = time.time()
mmw, nxw, ks, h_max, c_end, feasible, buf, done, scores = W.wf_init(
    jnp.asarray(qs), jnp.asarray(ts), jnp.asarray(qlens), jnp.asarray(tlens),
    pen, K
)
jax.block_until_ready(mmw)
print(f"wf_init {time.time()-t0:.1f}s")

NULL = W.NULL
adv_hist = np.zeros(64, np.int64)  # log2 buckets of per-level advance
spread_hist = {bs: np.zeros(64, np.int64) for bs in (8, 16, 32)}
act_lo = []
act_hi = []
prev_m = None
lvl = 0
for seg in range(N_SEG):
    if bool(np.asarray(jnp.all(done))):
        break
    t0 = time.time()
    buf, done, scores, hist = W.wf_span(
        mmw, nxw, ks, h_max, c_end, jnp.asarray(tlens), feasible,
        jnp.int32(seg * C), buf, done, scores, pen=pen, n_steps=C,
        with_history=True,
    )
    m = np.asarray(hist["m"])  # (C, B, K) int32
    print(f"seg {seg} sweep+fetch {time.time()-t0:.1f}s done={int(np.asarray(done).sum())}", flush=True)
    valid = m > NULL
    mv = np.where(valid, m, 0)
    # advance per lane per level
    if prev_m is None:
        prev = np.full((B, K), NULL, np.int32)
        prev_v = np.zeros((B, K), bool)
    else:
        prev, prev_v = prev_m
    for c in range(C):
        cur, cur_v = m[c], valid[c]
        both = cur_v & prev_v
        adv = (cur - prev)[both]
        adv = adv[adv > 0]
        if adv.size:
            b = np.minimum(np.log2(adv).astype(int) + 1, 63)
            np.add.at(adv_hist, b, 1)
        prev, prev_v = cur, cur_v
    prev_m = (prev, prev_v)
    # block spreads (vectorized over levels)
    for bs in (8, 16, 32):
        r = m.reshape(C, B, K // bs, bs)
        rv = valid.reshape(C, B, K // bs, bs)
        mx = np.where(rv, r, -(2**30)).max(axis=3)
        mn = np.where(rv, r, 2**30).min(axis=3)
        any_v = rv.any(axis=3)
        sp = np.where(any_v, mx - mn, -1)
        spv = sp[sp >= 0]
        b = np.minimum(np.log2(np.maximum(spv, 1)).astype(int) + 1, 63)
        np.add.at(spread_hist[bs], b, 1)
    # active range
    idx = np.arange(K)
    for c in range(0, C, 16):
        v = valid[c].any(axis=0)
        if v.any():
            act_lo.append(int(idx[v].min()))
            act_hi.append(int(idx[v].max()))
    lvl += C

print("scores:", np.asarray(scores)[: len(pairs)])


def show(name, h):
    tot = h.sum()
    if tot == 0:
        return
    c = np.cumsum(h) / tot
    print(f"{name}: total={tot}")
    for b in range(1, 20):
        if h[b] or (b < 16):
            print(f"  <=2^{b-1}={2**(b-1):6d}: {h[b]:>12d}  cum {c[b]*100:6.2f}%")


show("per-level h-advance (log2 buckets)", adv_hist)
for bs in (8, 16, 32):
    show(f"block-{bs} spread", spread_hist[bs])
if act_lo:
    print(
        "active range: lo p1/p50=",
        np.percentile(act_lo, [1, 50]).astype(int),
        " hi p50/p99=",
        np.percentile(act_hi, [50, 99]).astype(int),
    )
