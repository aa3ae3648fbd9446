"""Microbenchmark the wf_segmented per-score-level step components."""
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp

from allwave_tpu.wfa.params import resolve_penalties, Penalties
from allwave_tpu.core.scores import parse_scores
from allwave_tpu.wfa import wf_segmented as W
from allwave_tpu.wfa.batch import NULL, _shift_left, _shift_right

pen = resolve_penalties(parse_scores("0,5,8,2,24,1"))
B, K, L = 16, 4096, 131072
LW = L // 32
D = pen.max_lookback + 1
C = 256

rng = np.random.default_rng(0)
mmw = jnp.asarray(rng.integers(0, 2**32, size=(B, K, LW), dtype=np.uint32))
warange = jnp.arange(LW, dtype=jnp.int32)[None, None, :]
cand = jnp.where(mmw != 0, warange, jnp.int32(LW))
nxw = jax.lax.cummin(cand, axis=2, reverse=True)
nxw.block_until_ready()

ks = jnp.zeros((B, K), jnp.int32)
h_max = jnp.full((B, K), L - 1, jnp.int32)
tlens = jnp.full((B,), L - 5, jnp.int32)
c_end = jnp.full((B,), K // 2, jnp.int32)
feasible = jnp.ones((B,), jnp.bool_)
buf = {c: jnp.full((D, B, K), NULL, jnp.int32) for c in W._COMPS}
buf["m"] = buf["m"].at[0].set(
    jnp.asarray(rng.integers(0, L // 2, size=(B, K), dtype=np.int32))
)
done = jnp.zeros((B,), jnp.bool_)
scores = jnp.full((B,), -1, jnp.int32)


def timeit(name, fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, out
    )
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, out
    )
    dt = (time.time() - t0) / n
    print(f"{name:40s} {dt*1e3:9.2f} ms  ({dt/C*1e6:7.1f} us/level)")
    return out


# full span (reference point)
timeit("wf_span C=256 (full)", W.wf_span, mmw, nxw, ks, h_max, c_end, tlens,
       feasible, jnp.int32(0), buf, done, scores, pen=pen, n_steps=C,
       with_history=False)


# span WITHOUT extension (transitions only)
def _wf_step_noext(pen, s, buf, ks, h_max):
    def src(comp, ds):
        idx = jnp.mod(s - ds, D)
        plane = jax.lax.dynamic_index_in_dim(buf[comp], idx, axis=0, keepdims=False)
        return jnp.where(s >= ds, plane, NULL)

    trim = lambda a: jnp.where(a > h_max, NULL, a)
    i1_src = jnp.maximum(_shift_right(src("m", pen.o1 + pen.e1)),
                         _shift_right(src("i1", pen.e1)))
    i1 = trim(jnp.where(i1_src > NULL, i1_src + 1, NULL))
    d1 = trim(jnp.maximum(_shift_left(src("m", pen.o1 + pen.e1)),
                          _shift_left(src("d1", pen.e1))))
    best = jnp.maximum(i1, d1)
    i2_src = jnp.maximum(_shift_right(src("m", pen.o2 + pen.e2)),
                         _shift_right(src("i2", pen.e2)))
    i2 = trim(jnp.where(i2_src > NULL, i2_src + 1, NULL))
    d2 = trim(jnp.maximum(_shift_left(src("m", pen.o2 + pen.e2)),
                          _shift_left(src("d2", pen.e2))))
    best = jnp.maximum(best, jnp.maximum(i2, d2))
    mis = src("m", pen.x)
    mis = trim(jnp.where(mis > NULL, mis + 1, NULL))
    m = trim(jnp.maximum(best, mis))
    return m, i1, d1, i2, d2


@functools.partial(jax.jit, static_argnames=("n_steps",))
def span_noext(buf, done, scores, n_steps):
    def step(carry, j):
        buf, done, scores = carry
        s = j + 1
        m, i1, d1, i2, d2 = _wf_step_noext(pen, s, buf, ks, h_max)
        slot = jnp.mod(s, D)
        buf = {k: buf[k].at[slot].set(v) for k, v in
               zip(W._COMPS, (m, i1, d1, i2, d2))}
        at_end = jnp.take_along_axis(m, c_end[:, None], axis=1)[:, 0]
        done_now = (at_end == tlens) & feasible & ~done
        scores = jnp.where(done_now, s, scores)
        return (buf, done | done_now, scores), 0

    (buf, done, scores), _ = jax.lax.scan(step, (buf, done, scores),
                                          jnp.arange(n_steps, dtype=jnp.int32))
    return buf, done, scores


timeit("span no-extension", span_noext, buf, done, scores, n_steps=C)


# extension only, in a scan (3-gather variant, as shipped)
@functools.partial(jax.jit, static_argnames=("n_steps",))
def ext_only(h0, n_steps):
    def step(h, _):
        h2 = W._extend_bm(h, h_max, mmw, nxw, L)
        return jnp.where(h2 < L - 1, h2 + 1, 0), 0

    h, _ = jax.lax.scan(step, h0, jnp.arange(n_steps, dtype=jnp.int32))
    return h


h0 = jnp.asarray(rng.integers(0, L // 2, size=(B, K), dtype=np.int32))
timeit("extension only (3 gathers)", ext_only, h0, n_steps=C)


# single gather in a scan
@functools.partial(jax.jit, static_argnames=("n_steps",))
def gather1(h0, n_steps):
    def step(h, _):
        w0 = jnp.clip(h >> 5, 0, LW - 1)
        word0 = jnp.take_along_axis(mmw, w0[:, :, None], axis=2)[:, :, 0]
        return jnp.where(word0 != 0, h + 1, h + 2) % (L - 1), 0

    h, _ = jax.lax.scan(step, h0, jnp.arange(n_steps, dtype=jnp.int32))
    return h


timeit("single gather from (B,K,LW)", gather1, h0, n_steps=C)


# buffer update cost alone
@functools.partial(jax.jit, static_argnames=("n_steps",))
def bufonly(buf, n_steps):
    def step(buf, j):
        slot = jnp.mod(j, D)
        m = jax.lax.dynamic_index_in_dim(buf["m"], slot, axis=0, keepdims=False)
        buf = {k: v.at[slot].set(m + 1) for k, v in buf.items()}
        return buf, 0

    buf, _ = jax.lax.scan(step, buf, jnp.arange(n_steps, dtype=jnp.int32))
    return buf


timeit("buffer DUS x5 only", bufonly, buf, n_steps=C)
