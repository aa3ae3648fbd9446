"""Clean wf_span timing probe: same shapes as config 5b's big group,
inputs passed as jit arguments (never captured constants), explicit
blocking, multiple reps, and a variant matrix to isolate the cost:
  - full wf_span (as shipped)
  - extension disabled (monkeypatched identity)
  - transitions disabled (extension only)
Run with real wf_init products AND with synthetic arrays to rule out
layout effects.
"""
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp

from allwave_tpu.core.scores import parse_scores
from allwave_tpu.wfa.params import resolve_penalties
from allwave_tpu.wfa import wf_segmented as W

pen = resolve_penalties(parse_scores("0,5,8,2,24,1"))
B, K, L = 16, 4096, 131072
LW = L // 32
D = pen.max_lookback + 1
C = 256

rng = np.random.default_rng(0)


def block(x):
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, x
    )


def timeit(name, fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    block(out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        block(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{name:44s} {dt*1e3:9.2f} ms  ({dt/C*1e6:8.1f} us/level)  reps={['%.0f' % (t*1e3) for t in times]}")
    return out


# ---- synthetic inputs, all device arrays passed as args ----
mmw = jnp.asarray(rng.integers(0, 2**32, size=(B, K, LW), dtype=np.uint32))
warange = jnp.arange(LW, dtype=jnp.int32)[None, None, :]
nxw = jax.jit(lambda m: jax.lax.cummin(jnp.where(m != 0, warange, jnp.int32(LW)), axis=2, reverse=True))(mmw)
ks = jnp.zeros((B, K), jnp.int32)
h_max = jnp.full((B, K), L - 1, jnp.int32)
tlens = jnp.full((B,), L - 5, jnp.int32)
c_end = jnp.full((B,), K // 2, jnp.int32)
feasible = jnp.ones((B,), jnp.bool_)
buf = {c: jnp.full((D, B, K), W.NULL, jnp.int32) for c in W._COMPS}
buf["m"] = buf["m"].at[0].set(
    jnp.asarray(rng.integers(0, L // 2, size=(B, K), dtype=np.int32))
)
done = jnp.zeros((B,), jnp.bool_)
scores = jnp.full((B,), -1, jnp.int32)
block((mmw, nxw, buf))

print(f"B={B} K={K} L={L} D={D} C={C}")

out = timeit(
    "wf_span shipped", W.wf_span, mmw, nxw, ks, h_max, c_end, tlens,
    feasible, jnp.int32(0), buf, done, scores, pen=pen, n_steps=C,
    with_history=False,
)
print("  out scores[:4] =", np.asarray(out[2])[:4], " done any:", bool(np.asarray(out[1]).any()))

# extension stripped (identity): measures transitions+buffer+done bookkeeping
_orig_ext = W._extend_bm
W._extend_bm = lambda h, h_max, mmw, nxw, l_pad: h
span_noext = jax.jit(
    functools.partial(W.wf_span.__wrapped__, pen=pen, n_steps=C, with_history=False)
)
out2 = timeit(
    "wf_span ext=identity", span_noext, mmw, nxw, ks, h_max, c_end, tlens,
    feasible, jnp.int32(0), buf, done, scores,
)
W._extend_bm = _orig_ext

# extension alone in a scan, arrays as args
@functools.partial(jax.jit, static_argnames=("n_steps",))
def ext_only(h0, mmw, nxw, h_max, n_steps):
    def step(h, _):
        h2 = W._extend_bm(h, h_max, mmw, nxw, L)
        return jnp.where(h2 < L - 1, h2 + 1, 0), 0

    h, _ = jax.lax.scan(step, h0, None, length=n_steps)
    return h

h0 = jnp.asarray(rng.integers(0, L // 2, size=(B, K), dtype=np.int32))
timeit("ext only (3 gathers x C)", ext_only, h0, mmw, nxw, h_max, n_steps=C)

# one gather per level
@functools.partial(jax.jit, static_argnames=("n_steps",))
def gather1(h0, mmw, n_steps):
    def step(h, _):
        w0 = jnp.clip(h >> 5, 0, LW - 1)
        word0 = jnp.take_along_axis(mmw, w0[:, :, None], axis=2)[:, :, 0]
        return jnp.where(word0 != 0, h + 1, h + 2) % (L - 1), 0

    h, _ = jax.lax.scan(step, h0, None, length=n_steps)
    return h

timeit("1 gather x C", gather1, h0, mmw, n_steps=C)

# buffer DUS only
@functools.partial(jax.jit, static_argnames=("n_steps",))
def bufonly(buf, n_steps):
    def step(buf, j):
        slot = jnp.mod(j, D)
        m = jax.lax.dynamic_index_in_dim(buf["m"], slot, axis=0, keepdims=False)
        buf = {k: v.at[slot].set(m + 1) for k, v in buf.items()}
        return buf, 0

    buf, _ = jax.lax.scan(step, buf, jnp.arange(n_steps, dtype=jnp.int32))
    return buf

timeit("buffer DUS x5 x C", bufonly, buf, n_steps=C)
