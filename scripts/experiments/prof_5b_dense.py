"""Time the DENSE segmented path on the config-5b workload (100 kb
@0.25%), with an accurate score hint so the band starts at the right
rung — the candidate replacement for wf_segmented on this regime."""
import time
import numpy as np

from allwave_tpu.core.scores import parse_scores
from allwave_tpu.testing.synth import MutationConfig, make_test_case
from allwave_tpu.wfa.params import resolve_penalties
from allwave_tpu.wfa.segmented import SegmentedDenseAligner

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
print("pairs:", len(pairs))

al = SegmentedDenseAligner(pen)
print("impl:", al.impl)

# hint near the true score (~1500): what the mash-derived hint would give
hint = [1500] * len(pairs)
kend = abs(len(pairs[0][1]) - len(pairs[0][0]))
print("k_for_score(1500):", al._k_for_score(1500, kend))

t0 = time.time()
res = al.align_pairs(pairs, sigma_hint=hint)
t1 = time.time()
scores = [r[0] if isinstance(r, tuple) else None for r in res]
print(f"cold: {t1-t0:.2f}s  scores[:6]: {scores[:6]}")

t0 = time.time()
res = al.align_pairs(pairs, sigma_hint=hint)
t1 = time.time()
print(f"warm: {t1-t0:.2f}s -> {len(pairs)/(t1-t0):.2f} aln/s")

# --- per-pair hints (no escalation) + sweep-only timing ---
import jax.numpy as jnp
from allwave_tpu.wfa.segmented import dense_sweep_ckpt

hint2 = [s if s else 1500 for s in scores]
t0 = time.time()
res2 = al.align_pairs(pairs, sigma_hint=hint2)
t1 = time.time()
print(f"warm per-pair hints: {t1-t0:.2f}s -> {len(pairs)/(t1-t0):.2f} aln/s")

# sweep-only at K=1536 for the 6 low-div pairs
lo_pairs = [p for p, s in zip(pairs, scores) if s and s < 2000]
B = len(lo_pairs)
l_pad = al._next_pow2(max(max(len(q), len(t)) for q, t in lo_pairs))
qs = np.zeros((B, l_pad), np.uint8)
ts = np.zeros((B, l_pad), np.uint8)
qlens = np.zeros((B,), np.int32)
tlens = np.zeros((B,), np.int32)
for j, (q, t) in enumerate(lo_pairs):
    qs[j, : len(q)] = np.frombuffer(q, dtype=np.uint8)
    ts[j, : len(t)] = np.frombuffer(t, dtype=np.uint8)
    qlens[j] = len(q)
    tlens[j] = len(t)
qs, ts = jnp.asarray(qs), jnp.asarray(ts)
qlens, tlens = jnp.asarray(qlens), jnp.asarray(tlens)
out = dense_sweep_ckpt(qs, ts, qlens, tlens, pen, 1536, l_pad, 4096, al.impl)
np.asarray(out[0])
t0 = time.time()
out = dense_sweep_ckpt(qs, ts, qlens, tlens, pen, 1536, l_pad, 4096, al.impl)
np.asarray(out[0])
t1 = time.time()
print(f"sweep-only K=1536 B={B}: {t1-t0:.2f}s  scores {np.asarray(out[0])[:6]}")
