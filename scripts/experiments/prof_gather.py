"""Benchmark per-lane random-gather formulations on the TPU.

The wavefront extension needs, per score level, one random word per
band lane from a (B, K, LW) table. XLA's take_along_axis on the minor
axis measures ~15 ns/element — find a faster formulation.
"""
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp

B, K, LW = 16, 4096, 4096
C = 64  # levels per timed scan
N = B * K

rng = np.random.default_rng(0)
tbl = jnp.asarray(rng.integers(0, 2**31, size=(B, K, LW), dtype=np.int32))
tblT = jnp.asarray(np.ascontiguousarray(np.transpose(np.asarray(tbl), (0, 2, 1))))
tbl_flat = tbl.reshape(-1)
tbl2d = tbl.reshape(N, LW)
idx0 = jnp.asarray(rng.integers(0, LW, size=(B, K), dtype=np.int32))


def block(x):
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, x
    )


def timeit(name, fn, *args, n=3, **kw):
    try:
        out = fn(*args, **kw)
        block(out)
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:90]}")
        return
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        block(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    per = dt / C / N * 1e9
    print(f"{name:46s} {dt*1e3:9.2f} ms   {per:7.2f} ns/elt")
    return out


def scan_wrap(gather_fn):
    """Chain C dependent gathers so latency can't hide."""

    @jax.jit
    def run(idx, *tables):
        def step(h, _):
            v = gather_fn(h, *tables)
            return (h + (v & 7) + 1) % LW, 0

        h, _ = jax.lax.scan(step, idx, None, length=C)
        return h

    return run


# 1. take_along_axis on minor axis (baseline, as shipped)
timeit(
    "take_along_axis minor (B,K,LW)",
    scan_wrap(lambda h, t: jnp.take_along_axis(t, h[:, :, None], axis=2)[:, :, 0]),
    idx0, tbl,
)

# 2. take_along_axis along sublane axis of transposed (B,LW,K)
timeit(
    "take_along_axis axis1 of (B,LW,K)",
    scan_wrap(lambda h, t: jnp.take_along_axis(t, h[:, None, :], axis=1)[:, 0, :]),
    idx0, tblT,
)

# 3. flat 1D take with linearized indices
rowbase = (jnp.arange(B, dtype=jnp.int32)[:, None] * K + jnp.arange(K, dtype=jnp.int32)[None, :]) * LW
timeit(
    "flat take 1D linearized",
    scan_wrap(lambda h, t: jnp.take(t, rowbase + h)),
    idx0, tbl_flat,
)

# 4. 2D (N, LW) take_along_axis
idx2 = idx0.reshape(N)
timeit(
    "take_along_axis (N,LW) minor",
    scan_wrap(lambda h, t: jnp.take_along_axis(t, h[:, None], axis=1)[:, 0]).__wrapped__.__self__
    if False
    else scan_wrap(lambda h, t: jnp.take_along_axis(t, h[:, None], axis=1)[:, 0]),
    idx2, tbl2d,
)

# 5. vmap'd dynamic_slice over rows
def ds_row(row, h):
    return jax.lax.dynamic_slice_in_dim(row, h, 1)[0]

timeit(
    "vmap dynamic_slice (N,LW)",
    scan_wrap(lambda h, t: jax.vmap(ds_row)(t, h)),
    idx2, tbl2d,
)

# 6. gather of 2 adjacent elements (interleaved pair table)
tbl_pairs = jnp.asarray(
    rng.integers(0, 2**31, size=(B, K, LW, 2), dtype=np.int32)
).reshape(B, K, 2 * LW)

def gather_pair(h, t):
    v0 = jnp.take_along_axis(t, (2 * h)[:, :, None], axis=2)[:, :, 0]
    v1 = jnp.take_along_axis(t, (2 * h + 1)[:, :, None], axis=2)[:, :, 0]
    return v0 ^ v1

timeit("2 adjacent elts interleaved", scan_wrap(gather_pair), idx0, tbl_pairs)

# 7. one dynamic_slice of 2 from interleaved, via take of pairs:
#    reshape (B,K,LW,2)->gather along axis 2 keeping last dim
tbl_p4 = tbl_pairs.reshape(B, K, LW, 2)

def gather_pair_slice(h, t):
    g = jnp.take_along_axis(t, h[:, :, None, None], axis=2)  # (B,K,1,2)
    return g[:, :, 0, 0] ^ g[:, :, 0, 1]

timeit("pair via take_along_axis keepdim", scan_wrap(gather_pair_slice), idx0, tbl_p4)

# 8. small table: does LW matter? LW=512
LWs = 512
tbl_small = jnp.asarray(rng.integers(0, 2**31, size=(B, K, LWs), dtype=np.int32))
idx_s = idx0 % LWs

@jax.jit
def run_small(idx, t):
    def step(h, _):
        v = jnp.take_along_axis(t, h[:, :, None], axis=2)[:, :, 0]
        return (h + (v & 7) + 1) % LWs, 0

    h, _ = jax.lax.scan(step, idx, None, length=C)
    return h

timeit("take_along_axis minor LW=512", run_small, idx_s, tbl_small)

# 9. select-scan over a 16-wide window (per-lane window base given):
#    cost model for windowed extension: window (B,K,16) gathered once
#    per refill; here just measure the in-window select per level
win = jnp.asarray(rng.integers(0, 2**31, size=(B, K, 16), dtype=np.int32))

@jax.jit
def run_winsel(idx, w):
    def step(h, _):
        off = h & 15
        sel = jnp.sum(
            jnp.where(
                jnp.arange(16, dtype=jnp.int32)[None, None, :] == off[:, :, None],
                w,
                0,
            ),
            axis=2,
        )
        return (h + (sel & 7) + 1) % LW, 0

    h, _ = jax.lax.scan(step, idx, None, length=C)
    return h

timeit("16-way select from VMEM window", run_winsel, idx0, win)

# 10. fewer elements: B=16,K=1024 minor gather
tbl_k1k = tbl[:, :1024]
idx_k1k = idx0[:, :1024]

@jax.jit
def run_k1k(idx, t):
    def step(h, _):
        v = jnp.take_along_axis(t, h[:, :, None], axis=2)[:, :, 0]
        return (h + (v & 7) + 1) % LW, 0

    h, _ = jax.lax.scan(step, idx, None, length=C)
    return h

t0 = None
try:
    out = run_k1k(idx_k1k, tbl_k1k)
    block(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run_k1k(idx_k1k, tbl_k1k)
        block(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    per = dt / C / (B * 1024) * 1e9
    print(f"{'minor gather, K=1024 (quarter elts)':46s} {dt*1e3:9.2f} ms   {per:7.2f} ns/elt")
except Exception as e:
    print("K=1024 FAILED", e)

# 11. uint8 table gather
tbl_u8 = (tbl & 0xFF).astype(jnp.uint8)

@jax.jit
def run_u8(idx, t):
    def step(h, _):
        v = jnp.take_along_axis(t, h[:, :, None], axis=2)[:, :, 0].astype(jnp.int32)
        return (h + (v & 7) + 1) % LW, 0

    h, _ = jax.lax.scan(step, idx, None, length=C)
    return h

timeit("take_along_axis minor uint8", run_u8, idx0, tbl_u8)
