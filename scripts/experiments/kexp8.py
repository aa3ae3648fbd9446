"""Replay-span store cost: which plane dtype is cheap to emit?

The replay span (with_choices=True) measured ~15 ms per 4096-step
segment at (tb=16, K=2048) while the score-only span costs 0.77 ms.
Suspect: the int32->uint8 relayout (4:1 pack) on TWO planes per step.
Variants measured here, same DP loop, same block structure:

  p0  no planes (score-only baseline)
  p1  two uint8 planes  (today's span format)
  p2  one uint16 merged plane (one-shot kernel's format)
  p3  one int32 merged plane (no relayout at all)
"""
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = (1 << 30) - 1
TB, K, W = 16, 2048, 128
DC = 32
NSTEPS = 4096
ND = NSTEPS // DC
O1E1, E1, O2E2, E2, X = 10, 2, 25, 1, 5


def make_kernel(mode):
    def kernel(qb0, tb0, s_in, sout, *rest):
        if mode == "p1":
            ch_ref, run_ref_o = rest[0], rest[1]
            scr = rest[2:]
        elif mode in ("p2", "p3"):
            ch_ref = rest[0]
            scr = rest[1:]
        else:
            scr = rest
        s, i1, d1, i2, d2, qb, tb_, runl = scr
        lane = jax.lax.broadcasted_iota(jnp.int32, (TB, K), 1)
        q2 = jnp.int32(2 * (K * 40))
        t2 = jnp.int32(2 * (K * 40))
        dch = pl.program_id(0)

        @pl.when(dch == 0)
        def _init():
            s[:] = s_in[:]
            for r in (i1, d1, i2, d2):
                r[:] = jnp.full((TB, K), INF, jnp.int32)
            runl[:] = jnp.zeros((TB, K), jnp.int32)
            qb[:, W:] = qb0[:, :K]
            tb_[:, :K] = tb0[:, :K]

        def one(j, _):
            d = dch * DC + j + 2
            inf = jnp.int32(INF)
            qb[:] = pltpu.roll(qb[:], shift=1, axis=1)
            tb_[:] = pltpu.roll(tb_[:], shift=tb_.shape[1] - 1, axis=1)
            qv = qb[:, W:]
            tv = tb_[:, :K]
            lo = jnp.maximum(d - q2, -d)
            hi = jnp.minimum(t2 - d, d)
            active = ((lane & 1) == (d & 1)) & (lane >= lo) & (lane <= hi)
            sp = s[:]
            s_km1 = jnp.where(lane == 0, inf, pltpu.roll(sp, shift=1, axis=1))
            s_kp1 = jnp.where(lane == K - 1, inf, pltpu.roll(sp, shift=K - 1, axis=1))
            i1e = jnp.where(lane == 0, inf, pltpu.roll(i1[:], shift=1, axis=1)) + E1
            i1n = jnp.minimum(s_km1 + O1E1, i1e)
            i1x = i1e <= s_km1 + O1E1
            d1e = jnp.where(lane == K - 1, inf, pltpu.roll(d1[:], shift=K - 1, axis=1)) + E1
            d1n = jnp.minimum(s_kp1 + O1E1, d1e)
            d1x = d1e <= s_kp1 + O1E1
            i2e = jnp.where(lane == 0, inf, pltpu.roll(i2[:], shift=1, axis=1)) + E2
            i2n = jnp.minimum(s_km1 + O2E2, i2e)
            i2x = i2e <= s_km1 + O2E2
            d2e = jnp.where(lane == K - 1, inf, pltpu.roll(d2[:], shift=K - 1, axis=1)) + E2
            d2n = jnp.minimum(s_kp1 + O2E2, d2e)
            d2x = d2e <= s_kp1 + O2E2
            best = jnp.minimum(jnp.minimum(i1n, d1n), jnp.minimum(i2n, d2n))
            ismatch = qv == tv
            diag = jnp.where((lane <= d - 2) & (lane >= 2 - d),
                             sp + jnp.where(ismatch, 0, X), inf)
            sn = jnp.minimum(diag, best)
            if mode != "p0":
                choice = jnp.full((TB, K), 0, jnp.int32)
                choice = jnp.where(d2n == sn, 5, choice)
                choice = jnp.where(d1n == sn, 3, choice)
                choice = jnp.where(i2n == sn, 4, choice)
                choice = jnp.where(i1n == sn, 2, choice)
                choice = jnp.where((diag == sn) & ~ismatch, 1, choice)
                packed = (choice | (i1x.astype(jnp.int32) << 3)
                          | (d1x.astype(jnp.int32) << 4)
                          | (i2x.astype(jnp.int32) << 5)
                          | (d2x.astype(jnp.int32) << 6))
                newrun = jnp.where(choice == 0, jnp.minimum(runl[:], 254) + 1, 0)
                if mode == "p1":
                    ch_ref[j] = packed.astype(jnp.uint8)
                    run_ref_o[j] = newrun.astype(jnp.uint8)
                elif mode == "p2":
                    ch_ref[j] = (packed | (newrun << 8)).astype(jnp.uint16)
                else:
                    ch_ref[j] = packed | (newrun << 8)
                runl[:] = jnp.where(active, newrun, runl[:])
            s[:] = jnp.where(active, sn, sp)
            i1[:] = jnp.where(active, i1n, i1[:])
            d1[:] = jnp.where(active, d1n, d1[:])
            i2[:] = jnp.where(active, i2n, i2[:])
            d2[:] = jnp.where(active, d2n, d2[:])
            return 0

        def two(jj, _):
            one(2 * jj, 0)
            one(2 * jj + 1, 0)
            return 0

        jax.lax.fori_loop(0, DC // 2, two, 0)
        sout[:] = s[:]

    return kernel


def run(mode):
    rng = np.random.default_rng(0)
    qb0 = jnp.asarray(rng.integers(0, 4, (TB, K), dtype=np.int32))
    tb0 = jnp.asarray(rng.integers(0, 4, (TB, K), dtype=np.int32))
    s_in = jnp.asarray(rng.integers(0, 100, (TB, K), dtype=np.int32))
    band = pl.BlockSpec((TB, K), lambda d: (0, 0), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((TB, K), jnp.int32)]
    out_specs = [band]
    plane = pl.BlockSpec((DC, TB, K), lambda d: (d, 0, 0), memory_space=pltpu.VMEM)
    if mode == "p1":
        out_shape += [jax.ShapeDtypeStruct((NSTEPS, TB, K), jnp.uint8)] * 2
        out_specs += [plane, plane]
    elif mode == "p2":
        out_shape += [jax.ShapeDtypeStruct((NSTEPS, TB, K), jnp.uint16)]
        out_specs += [plane]
    elif mode == "p3":
        out_shape += [jax.ShapeDtypeStruct((NSTEPS, TB, K), jnp.int32)]
        out_specs += [plane]
    f = jax.jit(lambda a, b, c: pl.pallas_call(
        make_kernel(mode),
        grid=(ND,),
        in_specs=[band] * 3,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((TB, K), jnp.int32)] * 5
        + [pltpu.VMEM((TB, W + K), jnp.int32)] * 2
        + [pltpu.VMEM((TB, K), jnp.int32)],
    )(a, b, c))
    try:
        out = f(qb0, tb0, s_in)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    except Exception as e:
        print(f"{mode}: FAILED {str(e)[:140]}")
        return
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(qb0, tb0, s_in)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{mode:4s} {dt*1e3:8.2f} ms/span  ({dt/NSTEPS*1e9:7.1f} ns/step)")


for m in ("p0", "p1", "p2", "p3"):
    run(m)
