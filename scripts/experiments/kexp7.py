"""Isolate the ~60 us per-grid-step overhead seen in the span kernels.

kexp6 v0: 4096 DP steps in ONE grid step = 9.2 ns/step. Production span
kernels run d_chunk=32..64 steps per grid step and cost ~2 us/step.
Variants here run the same total steps with different grid shapes and
I/O block configurations to find where the per-grid-step time goes.
"""
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = (1 << 30) - 1
TB, K, W = 16, 1536, 256
NSTEPS = 4096
O1E1, E1, O2E2, E2, X = 10, 2, 25, 1, 5


def step_math(s_ref, i1_ref, d1_ref, i2_ref, d2_ref, qb_ref, tb_ref, lane, q2, t2, d):
    qb_ref[:] = pltpu.roll(qb_ref[:], shift=1, axis=1)
    tb_ref[:] = pltpu.roll(tb_ref[:], shift=tb_ref.shape[1] - 1, axis=1)
    qv = qb_ref[:, W:]
    tv = tb_ref[:, :K]
    inf = jnp.int32(INF)
    lo = jnp.maximum(d - q2, -d)
    hi = jnp.minimum(t2 - d, d)
    ks = lane
    active = ((ks & 1) == (d & 1)) & (ks >= lo) & (ks <= hi)
    s = s_ref[:]
    s_km1 = jnp.where(lane == 0, inf, pltpu.roll(s, shift=1, axis=1))
    s_kp1 = jnp.where(lane == K - 1, inf, pltpu.roll(s, shift=K - 1, axis=1))
    i1n = jnp.minimum(s_km1 + O1E1,
                      jnp.where(lane == 0, inf, pltpu.roll(i1_ref[:], shift=1, axis=1)) + E1)
    d1n = jnp.minimum(s_kp1 + O1E1,
                      jnp.where(lane == K - 1, inf, pltpu.roll(d1_ref[:], shift=K - 1, axis=1)) + E1)
    i2n = jnp.minimum(s_km1 + O2E2,
                      jnp.where(lane == 0, inf, pltpu.roll(i2_ref[:], shift=1, axis=1)) + E2)
    d2n = jnp.minimum(s_kp1 + O2E2,
                      jnp.where(lane == K - 1, inf, pltpu.roll(d2_ref[:], shift=K - 1, axis=1)) + E2)
    best = jnp.minimum(jnp.minimum(i1n, d1n), jnp.minimum(i2n, d2n))
    sub = jnp.where(qv == tv, 0, X)
    diag = jnp.where((ks <= d - 2) & (ks >= 2 - d), s + sub, inf)
    sn = jnp.minimum(diag, best)
    s_ref[:] = jnp.where(active, sn, s)
    i1_ref[:] = jnp.where(active, i1n, i1_ref[:])
    d1_ref[:] = jnp.where(active, d1n, d1_ref[:])
    i2_ref[:] = jnp.where(active, i2n, i2_ref[:])
    d2_ref[:] = jnp.where(active, d2n, d2_ref[:])


def make_kernel(d_chunk, write_state_every, with_dummy_out, smem_d):
    def kernel(*refs):
        i = 0
        if smem_d:
            dlo_ref = refs[0]
            i = 1
        qb0, tb0, s_in = refs[i : i + 3]
        i += 3
        sout = refs[i]
        i += 1
        if with_dummy_out:
            dummy = refs[i]
            i += 1
        s, i1, d1, i2, d2, qb, tb_ = refs[i : i + 7]
        lane = jax.lax.broadcasted_iota(jnp.int32, (TB, K), 1)
        q2 = jnp.int32(2 * (K * 40))
        t2 = jnp.int32(2 * (K * 40))
        dch = pl.program_id(0)

        @pl.when(dch == 0)
        def _init():
            s[:] = s_in[:]
            for r in (i1, d1, i2, d2):
                r[:] = jnp.full((TB, K), INF, jnp.int32)
            qb[:, W:] = qb0[:, :K]
            tb_[:, :K] = tb0[:, :K]

        base = dlo_ref[0, 0] + dch * d_chunk if smem_d else dch * d_chunk

        def two(jj, _):
            d = base + 2 * jj + 2
            step_math(s, i1, d1, i2, d2, qb, tb_, lane, q2, t2, d)
            step_math(s, i1, d1, i2, d2, qb, tb_, lane, q2, t2, d + 1)
            return 0

        jax.lax.fori_loop(0, d_chunk // 2, two, 0)
        if with_dummy_out:
            dummy[0] = s[:].astype(jnp.uint8)
        if write_state_every:
            sout[:] = s[:]
        else:
            @pl.when(dch == pl.num_programs(0) - 1)
            def _fin():
                sout[:] = s[:]

    return kernel


def run(name, d_chunk, write_state_every=True, with_dummy_out=False,
        dummy_moving=False, smem_d=False):
    rng = np.random.default_rng(0)
    qb0 = jnp.asarray(rng.integers(0, 4, (TB, K), dtype=np.int32))
    tb0 = jnp.asarray(rng.integers(0, 4, (TB, K), dtype=np.int32))
    s_in = jnp.asarray(rng.integers(0, 100, (TB, K), dtype=np.int32))
    nd = NSTEPS // d_chunk
    band = pl.BlockSpec((TB, K), lambda d: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [band] * 3
    args = [qb0, tb0, s_in]
    if smem_d:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = [jnp.zeros((1, 1), jnp.int32)] + args
    out_shape = [jax.ShapeDtypeStruct((TB, K), jnp.int32)]
    out_specs = [band]
    if with_dummy_out:
        if dummy_moving:
            out_shape.append(jax.ShapeDtypeStruct((nd, TB, K), jnp.uint8))
            out_specs.append(
                pl.BlockSpec((1, TB, K), lambda d: (d, 0, 0), memory_space=pltpu.VMEM)
            )
        else:
            out_shape.append(jax.ShapeDtypeStruct((1, TB, K), jnp.uint8))
            out_specs.append(
                pl.BlockSpec((1, TB, K), lambda d: (0, 0, 0), memory_space=pltpu.VMEM)
            )
    kern = make_kernel(d_chunk, write_state_every, with_dummy_out, smem_d)
    f = jax.jit(
        lambda *a: pl.pallas_call(
            kern,
            grid=(nd,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((TB, K), jnp.int32)] * 5
            + [pltpu.VMEM((TB, W + K), jnp.int32)] * 2,
        )(*a)
    )
    try:
        out = f(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    except Exception as e:
        print(f"{name:44s} FAILED: {str(e)[:100]}")
        return
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{name:44s} {dt*1e3:8.2f} ms  {dt/NSTEPS*1e9:8.1f} ns/step "
          f"({dt/nd*1e6:7.1f} us/grid-step)")


run("g0 nd=1 (one grid step)", 4096)
run("g1 nd=16, state out every step", 256)
run("g2 nd=16, state out last only", 256, write_state_every=False)
run("g3 nd=128, state out every step", 32)
run("g4 nd=128, state out last only", 32, write_state_every=False)
run("g5 nd=128, + dummy const out", 32, True, True, False)
run("g6 nd=128, + dummy moving out", 32, True, True, True)
run("g7 nd=128, + smem scalar base", 32, True, False, False, True)
run("g8 nd=32 (dchunk=128), state every", 128)
run("g9 nd=64 (dchunk=64), state every", 64)
