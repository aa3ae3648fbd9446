import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import time
import numpy as np
from allwave_tpu.testing.synth import MutationConfig, make_test_case
from allwave_tpu.core.scores import parse_scores
from allwave_tpu.core.types import NoSparsification
from allwave_tpu.engine.pipeline import AllPairAligner

n_seqs, length, div = 128, 1000, 0.02
cfg = MutationConfig(snp_rate=div, insertion_rate=div / 40, deletion_rate=div / 40)
case = make_test_case(seed=1234, n_sequences=n_seqs, length=length, cfg=cfg)
seqs = case.sequences

def run_once():
    al = AllPairAligner(seqs, parse_scores("0,5,8,2,24,1"), exclude_self=True,
                        use_mash_orientation=True, sparsification=NoSparsification())
    out = []
    al.for_each_with_callback(out.append)
    return out

t0 = time.time(); w = run_once(); print(f"first: {time.time()-t0:.2f}s n={len(w)}", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.time(); out = run_once(); dt = time.time() - t0
    best = min(best, dt)
    print(f"run: {dt:.3f} s  {len(out)/dt:.0f}/s", flush=True)
print(f"best: {len(out)/best:.0f} aln/s")

# ---- kernel-only timing: _forward_t at the headline shape ----
import jax, jax.numpy as jnp
from allwave_tpu.wfa.params import resolve_penalties
from allwave_tpu.wfa import pallas_dense as PD

pen = resolve_penalties(parse_scores("0,5,8,2,24,1"))
B, K, L = 2048, 128, 1024
rng = np.random.RandomState(3)
qs = rng.randint(65, 69, (B, L)).astype(np.uint8)
ts = qs.copy()
m = rng.rand(B, L) < 0.02
ts[m] = rng.randint(65, 69, m.sum()).astype(np.uint8)
qlens = jnp.full((B,), L, jnp.int32)
tlens = jnp.full((B,), L, jnp.int32)
qsj, tsj = jnp.asarray(qs), jnp.asarray(ts)

@jax.jit
def fwd_choices(qs_, ts_, ql, tl):
    return PD._forward_t(qs_, ts_, ql, tl, pen, K, L, with_choices=True)

@jax.jit
def fwd_score(qs_, ts_, ql, tl):
    return PD._forward_t(qs_, ts_, ql, tl, pen, K, L, with_choices=False)

for name, fn in [("fwd+choices", fwd_choices), ("fwd score-only", fwd_score)]:
    out2 = fn(qsj, tsj, qlens, tlens)
    np.asarray(jax.tree_util.tree_leaves(out2)[0][:1])  # force
    ts_l = []
    for _ in range(3):
        t0 = time.perf_counter()
        out2 = fn(qsj, tsj, qlens, tlens)
        np.asarray(jax.tree_util.tree_leaves(out2)[0][:1])
        ts_l.append(time.perf_counter() - t0)
    dt = min(ts_l)
    cells = B * 2 * L * K
    print(f"{name}: {dt*1e3:.1f} ms for B={B} K={K} 2L={2*L} "
          f"-> {cells/dt/1e9:.1f} G cells/s, {dt/(2*L)*1e6:.2f} us/step, "
          f"{B/dt:.0f} pairs/s fwd-only", flush=True)
