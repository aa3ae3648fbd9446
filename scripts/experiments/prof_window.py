"""Window-geometry probe for the Pallas wavefront kernel (round 4).

On the bench 5b workload (100 kb @ ~0.25% SNP, seed 18) measures, at a
configurable band width K:

  1. true scores (how many levels the sweep needs, what K certifies),
  2. per 128-diagonal row: the bitmap WINDOW a windowed extension would
     need per level = max_h(26-level lookback window) - min_h(same),
     in 32-bit words  -> sizes the per-row VMEM window (Ws),
  3. per-level lead advance per row (window slide rate),
  4. fraction of rows fully dead per level (row-skipping payoff).

Run: PYTHONPATH=/root/repo python scripts/prof_window.py  [K=2048 SEGS=20]
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

K = int(os.environ.get("K", "2048"))
C = 256
N_SEG = int(os.environ.get("SEGS", "20"))
B = 16
l_pad = 131072
LOOKBACK = pen.max_lookback + 1  # 26
qs = np.zeros((B, l_pad), np.uint8)
ts = np.zeros((B, l_pad), np.uint8)
qlens = np.zeros((B,), np.int32)
tlens = np.zeros((B,), np.int32)
for j, (q, t) in enumerate(pairs):
    qs[j, : len(q)] = np.frombuffer(q, dtype=np.uint8)
    ts[j, : len(t)] = np.frombuffer(t, dtype=np.uint8)
    qlens[j] = len(q)
    tlens[j] = len(t)

print(f"K={K} B={B} pairs={len(pairs)} lens={qlens[:4]}", flush=True)
t0 = time.time()
mmw, nxw, ks, h_max, c_end, feasible, buf, done, scores = W.wf_init(
    jnp.asarray(qs), jnp.asarray(ts), jnp.asarray(qlens), jnp.asarray(tlens),
    pen, K,
)
jax.block_until_ready(mmw)
print(f"wf_init {time.time()-t0:.1f}s", flush=True)

NULL = W.NULL
ROWS = K // 128
# rolling per-row lo/hi over the last LOOKBACK levels
roll_lo = np.full((LOOKBACK, B, ROWS), 2**30, np.int64)
roll_hi = np.full((LOOKBACK, B, ROWS), -(2**30), np.int64)
need_hist = np.zeros(64, np.int64)  # log2 words needed per (row, level)
adv_hist = np.zeros(64, np.int64)  # per-level max advance per row (words)
dead_rows = 0
total_rows = 0
span_times = []
lvl = 0
prev_hi = None
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
    dt = time.time() - t0
    span_times.append(dt)
    print(
        f"seg {seg} sweep+fetch {dt:.1f}s done={int(np.asarray(done).sum())}",
        flush=True,
    )
    valid = m > NULL
    r = m.reshape(C, B, ROWS, 128).astype(np.int64)
    rv = valid.reshape(C, B, ROWS, 128)
    hi = np.where(rv, r, -(2**30)).max(axis=3)  # (C, B, ROWS)
    lo = np.where(rv, r, 2**30).min(axis=3)
    anyv = rv.any(axis=3)
    for c in range(C):
        slot = lvl % LOOKBACK
        roll_lo[slot] = np.where(anyv[c], lo[c], 2**30)
        roll_hi[slot] = np.where(anyv[c], hi[c], -(2**30))
        wlo = roll_lo.min(axis=0)
        whi = roll_hi.max(axis=0)
        has = whi >= wlo
        need = ((whi >> 5) - (wlo >> 5) + 1)[has]
        if need.size:
            b = np.minimum(np.log2(np.maximum(need, 1)).astype(int) + 1, 63)
            np.add.at(need_hist, b, 1)
        if prev_hi is not None:
            adv = ((hi[c] >> 5) - (prev_hi >> 5))
            adv = adv[anyv[c] & (adv >= 0)]
            if adv.size:
                b = np.minimum(np.log2(np.maximum(adv, 1)).astype(int) + 1, 63)
                np.add.at(adv_hist, b, 1)
        prev_hi = hi[c].copy()
        dead_rows += int((~anyv[c]).sum())
        total_rows += anyv[c].size
        lvl += 1

print("scores:", np.asarray(scores)[: len(pairs)])
print("done:", np.asarray(done)[: len(pairs)])
print(f"levels swept: {lvl}; mean span s: {np.mean(span_times):.2f} "
      f"({np.mean(span_times)/C*1e6:.0f} us/level incl. fetch)")


def show(name, h):
    tot = h.sum()
    if tot == 0:
        print(f"{name}: empty")
        return
    c = np.cumsum(h) / tot
    print(f"{name}: total={tot}")
    for b in range(1, 16):
        if h[b] or b < 12:
            print(f"  <=2^{b-1}={2**(b-1):6d}: {h[b]:>12d}  cum {c[b]*100:6.2f}%")


show("per-(row,level) window need, WORDS incl. 26-level lookback", need_hist)
show("per-(row,level) lead advance, WORDS", adv_hist)
print(f"dead-row fraction: {dead_rows/max(total_rows,1)*100:.1f}%")
