"""Why does a dense-band DP step cost ~2 us regardless of width?

Measured: run_dp_chunk at (tb=8, K=1536) and (tb=16, K=2048) both run
~1.9-2.2 us/step — per-step cost is dominated by the step's serial
critical path (ref store -> load turnaround, roll latency, scalar->
vector broadcasts), not by vector throughput. This experiment isolates
the contributors with stripped score-only kernels that keep the real
step's structure (5 components, neighbour rolls, d-dependent masks,
base-register advance):

  v0  ref-carried state, 2x unroll           (= today's structure)
  v1  value-carried state in fori_loop carry (no per-step ref traffic)
  v2  v1 + 4x unroll
  v3  v1 + 8x unroll
  v4  v1 with TWO independent problem copies interleaved in one loop
      (tests whether independent work hides the step latency)
"""
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = (1 << 30) - 1
TB, K, W = 8, 1536, 256
NSTEPS = 4096
O1E1, E1, O2E2, E2, X = 10, 2, 25, 1, 5


def step_math(s, i1, d1, i2, d2, qb, tb_, lane, q2, t2, d):
    qb = pltpu.roll(qb, shift=1, axis=1)
    tb_ = pltpu.roll(tb_, shift=tb_.shape[1] - 1, axis=1)
    qv = qb[:, W:]
    tv = tb_[:, :K]
    inf = jnp.int32(INF)
    lo = jnp.maximum(d - q2, -d)
    hi = jnp.minimum(t2 - d, d)
    ks = lane
    active = ((ks & 1) == (d & 1)) & (ks >= lo) & (ks <= hi)
    s_km1 = jnp.where(lane == 0, inf, pltpu.roll(s, shift=1, axis=1))
    s_kp1 = jnp.where(lane == K - 1, inf, pltpu.roll(s, shift=K - 1, axis=1))
    i1n = jnp.minimum(s_km1 + O1E1,
                      jnp.where(lane == 0, inf, pltpu.roll(i1, shift=1, axis=1)) + E1)
    d1n = jnp.minimum(s_kp1 + O1E1,
                      jnp.where(lane == K - 1, inf, pltpu.roll(d1, shift=K - 1, axis=1)) + E1)
    i2n = jnp.minimum(s_km1 + O2E2,
                      jnp.where(lane == 0, inf, pltpu.roll(i2, shift=1, axis=1)) + E2)
    d2n = jnp.minimum(s_kp1 + O2E2,
                      jnp.where(lane == K - 1, inf, pltpu.roll(d2, shift=K - 1, axis=1)) + E2)
    best = jnp.minimum(jnp.minimum(i1n, d1n), jnp.minimum(i2n, d2n))
    sub = jnp.where(qv == tv, 0, X)
    diag = jnp.where((ks <= d - 2) & (ks >= 2 - d), s + sub, inf)
    sn = jnp.minimum(diag, best)
    return (jnp.where(active, sn, s), jnp.where(active, i1n, i1),
            jnp.where(active, d1n, d1), jnp.where(active, i2n, i2),
            jnp.where(active, d2n, d2), qb, tb_)


def kernel_v0(qb0, tb0, s_in, sout, s, i1, d1, i2, d2, qb, tb_):
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, K), 1)
    q2 = jnp.int32(2 * (K * 40))
    t2 = jnp.int32(2 * (K * 40))
    s[:] = s_in[:]
    i1[:] = jnp.full((TB, K), INF, jnp.int32)
    d1[:] = jnp.full((TB, K), INF, jnp.int32)
    i2[:] = jnp.full((TB, K), INF, jnp.int32)
    d2[:] = jnp.full((TB, K), INF, jnp.int32)
    qb[:, W:] = qb0[:, :K]
    tb_[:, :K] = tb0[:, :K]

    def one(j, _):
        d = j + 2
        out = step_math(s[:], i1[:], d1[:], i2[:], d2[:], qb[:], tb_[:],
                        lane, q2, t2, d)
        s[:], i1[:], d1[:], i2[:], d2[:], qb[:], tb_[:] = out
        return 0

    def two(jj, _):
        one(2 * jj, 0)
        one(2 * jj + 1, 0)
        return 0

    jax.lax.fori_loop(0, NSTEPS // 2, two, 0)
    sout[:] = s[:]


def make_v_carry(unroll):
    def kernel(qb0, tb0, s_in, sout):
        lane = jax.lax.broadcasted_iota(jnp.int32, (TB, K), 1)
        q2 = jnp.int32(2 * (K * 40))
        t2 = jnp.int32(2 * (K * 40))
        inf = jnp.full((TB, K), INF, jnp.int32)
        qb = jnp.zeros((TB, W + K), jnp.int32).at[:, W:].set(qb0[:, :K])
        tb_ = jnp.zeros((TB, K + W), jnp.int32).at[:, :K].set(tb0[:, :K])
        carry0 = (s_in[:], inf, inf, inf, inf, qb, tb_)

        def group(jj, carry):
            for u in range(unroll):
                j = unroll * jj + u
                carry = step_math(*carry[:7], lane, q2, t2, j + 2)
            return carry

        carry = jax.lax.fori_loop(0, NSTEPS // unroll, group, carry0)
        sout[:] = carry[0]

    return kernel


def kernel_v4(qb0, tb0, s_in, sout):
    """Two independent copies interleaved (same total steps each)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, K), 1)
    q2 = jnp.int32(2 * (K * 40))
    t2 = jnp.int32(2 * (K * 40))
    inf = jnp.full((TB, K), INF, jnp.int32)
    qb = jnp.zeros((TB, W + K), jnp.int32).at[:, W:].set(qb0[:, :K])
    tb_ = jnp.zeros((TB, K + W), jnp.int32).at[:, :K].set(tb0[:, :K])
    a0 = (s_in[:], inf, inf, inf, inf, qb, tb_)
    b0 = (s_in[:] + 1, inf, inf, inf, inf, qb, tb_)

    def group(jj, ab):
        a, b = ab
        for u in range(2):
            j = 2 * jj + u
            a = step_math(*a[:7], lane, q2, t2, j + 2)
            b = step_math(*b[:7], lane, q2, t2, j + 2)
        return (a, b)

    a, b = jax.lax.fori_loop(0, NSTEPS // 2, group, (a0, b0))
    sout[:] = a[0] + b[0]


def run(kernel, name, scratch=False):
    rng = np.random.default_rng(0)
    qb0 = jnp.asarray(rng.integers(0, 4, (TB, K), dtype=np.int32))
    tb0 = jnp.asarray(rng.integers(0, 4, (TB, K), dtype=np.int32))
    s_in = jnp.asarray(rng.integers(0, 100, (TB, K), dtype=np.int32))
    kw = dict(
        out_shape=jax.ShapeDtypeStruct((TB, K), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    if scratch:
        kw["scratch_shapes"] = (
            [pltpu.VMEM((TB, K), jnp.int32)] * 5
            + [pltpu.VMEM((TB, W + K), jnp.int32)] * 2
        )
    f = jax.jit(lambda a, b, c: pl.pallas_call(kernel, **kw)(a, b, c))
    try:
        out = f(qb0, tb0, s_in)
        out.block_until_ready()
    except Exception as e:
        print(f"{name:34s} FAILED: {str(e)[:120]}")
        return
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(qb0, tb0, s_in)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{name:34s} {dt*1e3:8.2f} ms  {dt/NSTEPS*1e9:8.1f} ns/step")


run(kernel_v0, "v0 ref-carried, unroll2", scratch=True)
run(make_v_carry(2), "v1 value-carried, unroll2")
run(make_v_carry(4), "v2 value-carried, unroll4")
run(make_v_carry(8), "v3 value-carried, unroll8")
run(kernel_v4, "v4 2x independent interleaved")
