"""Profile config 5b (100 kb @0.25%) stage by stage on the real chip."""
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
c5b = make_test_case(seed=18, n_sequences=4, length=100_000, cfg=cfg5b)
seqs = c5b.sequences
pairs = [
    (seqs[i].seq, seqs[j].seq)
    for i in range(4)
    for j in range(4)
    if i != j
]
print("pairs:", len(pairs), "lens:", [len(p[0]) for p in pairs[:4]])

al = W.WavefrontSegmentedAligner(pen)
cfg = al.config

# mirror align_pairs' grouping with a synthetic hint (what does the
# pipeline pass?) -- use no hint first, then time the internals manually.
# Estimate the real score with one run first.
t0 = time.time()
res = al.align_pairs(pairs)
t1 = time.time()
print(f"cold align_pairs: {t1-t0:.2f}s")
scores = [r[0] if isinstance(r, tuple) else r for r in res]
print("scores:", scores[:6])

t0 = time.time()
res = al.align_pairs(pairs)
t1 = time.time()
print(f"warm align_pairs: {t1-t0:.2f}s -> {len(pairs)/(t1-t0):.2f} aln/s")

# ---- manual stage timing ----
smax = max(s for s in scores if isinstance(s, int))
hint = [smax] * len(pairs)
si = al._s_cap_for_hint(smax)
kend = abs(len(pairs[0][1]) - len(pairs[0][0]))
k = al._k_for_score(si // 2, kend)
print(f"K={k}, s_cap={si}, D={pen.max_lookback+1}, C={cfg.ckpt_every}")

B = al._next_pow2(len(pairs))
l_pad = al._next_pow2(max(max(len(q), len(t)) for q, t in pairs))
qs = np.zeros((B, l_pad), np.uint8)
ts = np.zeros((B, l_pad), np.uint8)
qlens = np.zeros((B,), np.int32)
tlens = np.zeros((B,), np.int32)
for j, (q, t) in enumerate(pairs):
    qs[j, : len(q)] = np.frombuffer(q, dtype=np.uint8)
    ts[j, : len(t)] = np.frombuffer(t, dtype=np.uint8)
    qlens[j] = len(q)
    tlens[j] = len(t)
qs_d, ts_d = jnp.asarray(qs), jnp.asarray(ts)
qlens_d, tlens_d = jnp.asarray(qlens), jnp.asarray(tlens)

def sync(x):
    jax.tree_util.tree_map(lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, x)

# wf_init (includes bitmap build)
t0 = time.time()
out = W.wf_init(qs_d, ts_d, qlens_d, tlens_d, pen, k)
sync(out)
t_init_cold = time.time() - t0
t0 = time.time()
out = W.wf_init(qs_d, ts_d, qlens_d, tlens_d, pen, k)
sync(out)
t_init = time.time() - t0
mmw, nxw, ks, h_max, c_end, feasible, buf, done, scores0 = out
print(f"wf_init: cold {t_init_cold:.2f}s warm {t_init:.3f}s  mmw {mmw.shape} {mmw.nbytes/1e6:.0f}MB")

# one sweep segment
C = cfg.ckpt_every
t0 = time.time()
buf2, done2, sc2, _ = W.wf_span(mmw, nxw, ks, h_max, c_end, tlens_d, feasible,
                                jnp.int32(0), buf, done, scores0,
                                pen=pen, n_steps=C, with_history=False)
sync((buf2, done2, sc2))
t_span_cold = time.time() - t0
t0 = time.time()
buf3, done3, sc3, _ = W.wf_span(mmw, nxw, ks, h_max, c_end, tlens_d, feasible,
                                jnp.int32(C), buf2, done2, sc2,
                                pen=pen, n_steps=C, with_history=False)
sync((buf3, done3, sc3))
t_span = time.time() - t0
print(f"wf_span({C}): cold {t_span_cold:.2f}s warm {t_span:.3f}s -> {t_span/C*1e3:.3f} ms/score-level")

# sweep to completion, timing each segment + the all(done) sync
t0 = time.time()
bufx, donex, scx = buf, done, scores0
seg = 0
ckpts = [bufx]
while True:
    ts0 = time.time()
    d = bool(np.asarray(jnp.all(donex)))
    t_sync = time.time() - ts0
    if d or seg * C >= si:
        break
    ts0 = time.time()
    bufx, donex, scx, _ = W.wf_span(mmw, nxw, ks, h_max, c_end, tlens_d, feasible,
                                    jnp.int32(seg * C), bufx, donex, scx,
                                    pen=pen, n_steps=C, with_history=False)
    sync((bufx, donex))
    print(f"  seg {seg}: span {time.time()-ts0:.3f}s (done-sync {t_sync*1e3:.1f}ms)")
    ckpts.append(bufx)
    seg += 1
print(f"sweep total: {time.time()-t0:.2f}s over {seg} segments")
print("scores:", np.asarray(scx)[:12])

# replay timing
run_cap = al._run_cap(np.asarray(scx), np.asarray(donex))
print("run_cap:", run_cap)
walk = (
    jnp.asarray(np.asarray(scx)),
    c_end,
    tlens_d,
    jnp.zeros((B,), jnp.int32),
    jnp.asarray(np.asarray(donex)),
)
bufs = (
    jnp.zeros((B, run_cap), jnp.uint8),
    jnp.zeros((B, run_cap), jnp.int32),
    jnp.zeros((B,), jnp.int32),
    jnp.zeros((B,), jnp.bool_),
)
t0 = time.time()
for s in range(seg - 1, -1, -1):
    ts0 = time.time()
    walk, bufs = W.wf_replay_traceback(mmw, nxw, ks, h_max, tlens_d,
                                       ckpts[s], jnp.int32(s * C), walk, bufs,
                                       pen=pen, n_steps=C, run_cap=run_cap)
    sync((walk, bufs))
    print(f"  replay seg {s}: {time.time()-ts0:.3f}s")
print(f"replay total: {time.time()-t0:.2f}s")
