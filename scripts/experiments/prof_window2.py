"""TRUE extension-window probe: per 128-diagonal row and level, the
window a gather-free extension actually needs = [min word(m_pre), max
word(m_post)] over alive lanes, where m_pre is the real pre-extension
candidate max (recomputed from full history with the engine's own
formulas). Also: how often the argmax candidate is the o2+e2 (25-level)
lookback (straggler source), and m_post monotonicity violations.

Run: PYTHONPATH=/root/repo:/root/.axon_site K=2048 python scripts/prof_window2.py
"""
import os
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
N_SEG = int(os.environ.get("SEGS", "14"))
B = 16
l_pad = 131072
D = pen.max_lookback + 1  # 26
qs = np.zeros((B, l_pad), np.uint8)
ts = np.zeros((B, l_pad), np.uint8)
qlens = np.zeros((B,), np.int32)
tlens = np.zeros((B,), np.int32)
for j, (q, t) in enumerate(pairs):
    qs[j, : len(q)] = np.frombuffer(q, dtype=np.uint8)
    ts[j, : len(t)] = np.frombuffer(t, dtype=np.uint8)
    qlens[j] = len(q)
    tlens[j] = len(t)

print(f"K={K} B={B}", flush=True)
t0 = time.time()
mmw, nxw, ks, h_max, c_end, feasible, buf, done, scores = W.wf_init(
    jnp.asarray(qs), jnp.asarray(ts), jnp.asarray(qlens), jnp.asarray(tlens),
    pen, K,
)
jax.block_until_ready(mmw)
print(f"wf_init {time.time()-t0:.1f}s", flush=True)

NULL = W.NULL
ROWS = K // 128
hmax_h = np.asarray(h_max).astype(np.int64)

# host-side rolling history of the last D levels per comp
histroll = {
    c: np.full((D, B, K), NULL, np.int64) for c in ("m", "i1", "d1", "i2", "d2")
}
histroll["m"][0] = np.asarray(buf["m"][0]).astype(np.int64)

need_hist = np.zeros(64, np.int64)
old_src = 0
tot_lanes = 0
mono_viol = 0
p_need = []  # per-(row,level) need words, sampled
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
    hh = {c: np.asarray(hist[c]).astype(np.int64) for c in hist}
    print(f"seg {seg} {time.time()-t0:.1f}s done={int(np.asarray(done).sum())}",
          flush=True)

    def sr(a):  # shift_right along K
        out = np.full_like(a, NULL)
        out[:, 1:] = a[:, :-1]
        return out

    def sl(a):
        out = np.full_like(a, NULL)
        out[:, :-1] = a[:, 1:]
        return out

    for c in range(C):
        s = lvl + 1  # absolute score of this level

        def src(comp, ds):
            t = s - ds
            if t < 0:
                return np.full((B, K), NULL, np.int64)
            return histroll[comp][t % D]

        i1s = np.maximum(sr(src("m", pen.o1 + pen.e1)), sr(src("i1", pen.e1)))
        i1 = np.where(i1s > NULL, i1s + 1, NULL)
        d1 = np.maximum(sl(src("m", pen.o1 + pen.e1)), sl(src("d1", pen.e1)))
        i2s = np.maximum(sr(src("m", pen.o2 + pen.e2)), sr(src("i2", pen.e2)))
        i2 = np.where(i2s > NULL, i2s + 1, NULL)
        d2 = np.maximum(sl(src("m", pen.o2 + pen.e2)), sl(src("d2", pen.e2)))
        mis = src("m", pen.x)
        mis = np.where(mis > NULL, mis + 1, NULL)
        trim = lambda a: np.where(a > hmax_h, NULL, a)
        m_pre = np.maximum.reduce([trim(i1), trim(d1), trim(i2), trim(d2), mis])
        m_post = hh["m"][c]
        ok = (m_pre > NULL) & (m_pre <= hmax_h)

        # was the argmax the deep (o2+e2) lookback?
        deep = np.maximum(sr(src("m", pen.o2 + pen.e2)), sl(src("m", pen.o2 + pen.e2)))
        deepv = np.where(deep > NULL, deep + 1, NULL)
        recent = np.maximum.reduce([trim(i1), trim(d1), mis,
                                    trim(np.where(sr(src("i2", pen.e2)) > NULL,
                                                  sr(src("i2", pen.e2)) + 1, NULL)),
                                    trim(np.where(sl(src("d2", pen.e2)) > NULL,
                                                  sl(src("d2", pen.e2)), NULL))])
        only_deep = ok & (trim(deepv) == m_pre) & (recent < m_pre)
        old_src += int(only_deep.sum())
        tot_lanes += int(ok.sum())

        prev_m = histroll["m"][(s - 1) % D] if s >= 1 else None
        if prev_m is not None:
            both = (m_post > NULL) & (prev_m > NULL)
            mono_viol += int((m_post[both] < prev_m[both]).sum())

        lo = np.where(ok, np.maximum(m_pre, 0) >> 5, 2**30).reshape(B, ROWS, 128).min(2)
        hi = np.where(m_post > NULL, np.maximum(m_post, 0) >> 5, -1).reshape(
            B, ROWS, 128
        ).max(2)
        has = (lo < 2**30) & (hi >= 0)
        need = (np.maximum(hi - lo, 0) + 1)[has]
        if need.size:
            b = np.minimum(np.log2(np.maximum(need, 1)).astype(int) + 1, 63)
            np.add.at(need_hist, b, 1)
            p_need.append(need)

        # roll forward
        slot = s % D
        for comp in ("m", "i1", "d1", "i2", "d2"):
            histroll[comp][slot] = hh[comp][c]
        lvl += 1

print("scores:", np.asarray(scores)[: len(pairs)])
tot = need_hist.sum()
cum = np.cumsum(need_hist) / max(tot, 1)
print(f"TRUE per-(row,level) extension window need (words): total={tot}")
for b in range(1, 14):
    print(f"  <=2^{b-1}={2**(b-1):5d}: {need_hist[b]:>11d}  cum {cum[b]*100:6.2f}%")
allneed = np.concatenate(p_need) if p_need else np.zeros(1)
print("need percentiles p50/p90/p99/p99.9/max:",
      np.percentile(allneed, [50, 90, 99, 99.9, 100]).astype(int))
print(f"deep-lookback-argmax lanes: {old_src}/{tot_lanes} "
      f"({old_src/max(tot_lanes,1)*100:.2f}%)")
print(f"monotonicity violations (m[s]<m[s-1]): {mono_viol}")
