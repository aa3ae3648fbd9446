"""Kernel experiments for the dense forward sweep (run on real TPU).

Variants of the hot step loop, timed against the production kernel:
  V0: production dense_forward_pallas (baseline)
  V1: band state carried as fori_loop VALUES instead of VMEM scratch
      (exposes dataflow to the scheduler -> ILP across the step ops)
  V2: V1 + op reduction: precomputed enter/leave activity thresholds,
      static per-position parity masks, threshold-based diag_ok
  V3: V2 + choices OFF (score-only ceiling, for reference)

All variants must reproduce V0's scores exactly (asserted).

Usage: python scripts/kexp.py [reps]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from allwave_tpu.core.scores import parse_scores
from allwave_tpu.wfa import pallas_dense as P
from allwave_tpu.wfa.dense import INF, _band_geometry
from allwave_tpu.wfa.params import resolve_penalties

from microbench import _batch  # noqa: E402


# ---------------------------------------------------------------- variants
def _kernel_v1(
    qlens_ref, tlens_ref, k0_ref, qb0_ref, tb0_ref, qheads_ref, ttails_ref,
    sout_ref, choices_ref,
    *, pen, d_chunk, with_choices, stream_period, opt, carry_scratch
):
    """Carry-based step loop. `opt` enables the op reductions."""
    K = sout_ref.shape[1]
    TB = sout_ref.shape[0]
    W = stream_period
    dch = pl.program_id(1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, K), 1)
    k0 = k0_ref[:, :1]
    ks = k0 + lane
    ks1 = ks & 1
    q2 = 2 * qlens_ref[:, :1]
    t2 = 2 * tlens_ref[:, :1]
    inf = jnp.int32(INF)
    lane0 = lane == 0
    laneK = lane == K - 1

    # activity thresholds: active(d) <=> d >= enter & d <= leave (& parity)
    enter = jnp.abs(ks)
    leave = jnp.minimum(ks + q2, t2 - ks)
    big = jnp.int32(2**30)
    # parity folded into per-parity enter thresholds (d odd / d even)
    enter_odd = jnp.where(ks1 == 1, enter, big)
    enter_even = jnp.where(ks1 == 0, enter, big)
    diag_thresh = enter + 2  # diag valid <=> d >= |ks| + 2

    o1e1 = jnp.int32(pen.o1 + pen.e1)
    e1 = jnp.int32(pen.e1)
    o2e2 = jnp.int32(pen.o2 + pen.e2)
    e2 = jnp.int32(pen.e2)
    x = jnp.int32(pen.x)

    s0 = jnp.where(ks == 0, 0, inf)
    gap0 = jnp.full((TB, K), inf, jnp.int32)
    run0 = jnp.zeros((TB, K), jnp.int32)

    # load persistent state (from carry scratch across grid steps)
    (s_c, i1_c, d1_c, i2_c, d2_c, qb_c, tb_c, run_c) = carry_scratch

    @pl.when(dch == 0)
    def _init():
        s_c[:] = s0
        i1_c[:] = gap0
        d1_c[:] = gap0
        i2_c[:] = gap0
        d2_c[:] = gap0
        qb_c[:, W:] = qb0_ref[:]
        run_c[:] = run0
        tb_c[:, :K] = tb0_ref[:]

    @pl.when(jax.lax.rem(dch * d_chunk, W) == 0)
    def _refill():
        qb_c[:, :W] = qheads_ref[:]
        tb_c[:, K:] = ttails_ref[:]

    def step(j, carry, d_parity_odd):
        (s_prev, i1, d1, i2, d2, qb_full, tb_full, runlen) = carry
        d = dch * d_chunk + j + 1

        qb_full = pltpu.roll(qb_full, shift=1, axis=1)
        tb_full = pltpu.roll(tb_full, shift=tb_full.shape[1] - 1, axis=1)
        qb = qb_full[:, W:]
        tb = tb_full[:, :K]

        if opt:
            ent = enter_odd if d_parity_odd else enter_even
            active = (d >= ent) & (d <= leave)
        else:
            lo = jnp.maximum(d - q2, -d)
            hi = jnp.minimum(t2 - d, d)
            active = (ks1 == (d & 1)) & (ks >= lo) & (ks <= hi)

        s_km1 = jnp.where(lane0, inf, pltpu.roll(s_prev, shift=1, axis=1))
        s_kp1 = jnp.where(laneK, inf, pltpu.roll(s_prev, shift=K - 1, axis=1))
        i1_ext_v = jnp.where(lane0, inf, pltpu.roll(i1, shift=1, axis=1)) + e1
        i1_opn_v = s_km1 + o1e1
        i1_new = jnp.minimum(i1_opn_v, i1_ext_v)
        i1_ext = i1_ext_v <= i1_opn_v
        d1_ext_v = jnp.where(laneK, inf, pltpu.roll(d1, shift=K - 1, axis=1)) + e1
        d1_opn_v = s_kp1 + o1e1
        d1_new = jnp.minimum(d1_opn_v, d1_ext_v)
        d1_ext = d1_ext_v <= d1_opn_v
        i2_ext_v = jnp.where(lane0, inf, pltpu.roll(i2, shift=1, axis=1)) + e2
        i2_opn_v = s_km1 + o2e2
        i2_new = jnp.minimum(i2_opn_v, i2_ext_v)
        i2_ext = i2_ext_v <= i2_opn_v
        d2_ext_v = jnp.where(laneK, inf, pltpu.roll(d2, shift=K - 1, axis=1)) + e2
        d2_opn_v = s_kp1 + o2e2
        d2_new = jnp.minimum(d2_opn_v, d2_ext_v)
        d2_ext = d2_ext_v <= d2_opn_v
        best_gap = jnp.minimum(
            jnp.minimum(i1_new, d1_new), jnp.minimum(i2_new, d2_new)
        )

        is_match = qb == tb
        sub_cost = jnp.where(is_match, 0, x)
        if opt:
            diag_ok = d >= diag_thresh
        else:
            diag_ok = (ks <= d - 2) & (ks >= 2 - d)
        diag = jnp.where(diag_ok, s_prev + sub_cost, inf)
        s_new = jnp.minimum(diag, best_gap)

        if with_choices:
            diag_hit = (diag == s_new) & diag_ok
            choice = jnp.full((TB, K), P.S_DIAG_MATCH, jnp.int32)
            choice = jnp.where(d2_new == s_new, jnp.int32(P.S_D2), choice)
            choice = jnp.where(d1_new == s_new, jnp.int32(P.S_D1), choice)
            choice = jnp.where(i2_new == s_new, jnp.int32(P.S_I2), choice)
            choice = jnp.where(i1_new == s_new, jnp.int32(P.S_I1), choice)
            choice = jnp.where(
                diag_hit & jnp.logical_not(is_match),
                jnp.int32(P.S_DIAG_MISMATCH),
                choice,
            )
            packed = (
                choice
                | (i1_ext.astype(jnp.int32) << 3)
                | (d1_ext.astype(jnp.int32) << 4)
                | (i2_ext.astype(jnp.int32) << 5)
                | (d2_ext.astype(jnp.int32) << 6)
            )
            is_run = choice == jnp.int32(P.S_DIAG_MATCH)
            inc = jnp.minimum(runlen, 254) + 1
            new_run = jnp.where(is_run, inc, 0)
            choices_ref[j] = (packed | (new_run << 8)).astype(jnp.uint16)
            runlen = jnp.where(active, new_run, runlen)

        s_prev = jnp.where(active, s_new, s_prev)
        i1 = jnp.where(active, i1_new, i1)
        d1 = jnp.where(active, d1_new, d1)
        i2 = jnp.where(active, i2_new, i2)
        d2 = jnp.where(active, d2_new, d2)
        return (s_prev, i1, d1, i2, d2, qb_full, tb_full, runlen)

    def pair2(jj, carry):
        carry = step(2 * jj, carry, True)   # d = even_base + odd offset
        carry = step(2 * jj + 1, carry, False)
        return carry

    carry0 = (
        s_c[:], i1_c[:], d1_c[:], i2_c[:], d2_c[:], qb_c[:], tb_c[:], run_c[:]
    )
    carry = jax.lax.fori_loop(0, d_chunk // 2, pair2, carry0)
    (s, i1, d1, i2, d2, qb, tb, run) = carry
    s_c[:] = jnp.minimum(s, inf)
    i1_c[:] = jnp.minimum(i1, inf)
    d1_c[:] = jnp.minimum(d1, inf)
    i2_c[:] = jnp.minimum(i2, inf)
    d2_c[:] = jnp.minimum(d2, inf)
    qb_c[:] = qb
    tb_c[:] = tb
    run_c[:] = run
    sout_ref[:] = s_c[:]


@functools.partial(
    jax.jit, static_argnames=("pen", "k_width", "l_pad", "with_choices", "opt")
)
def forward_v(
    qs, ts, qlens, tlens, pen, k_width, l_pad, with_choices, opt
):
    B0 = qs.shape[0]
    K = k_width
    tb, d_chunk, period = P._tiles_for(K, max(l_pad, 4))
    l_pad_eff = max(l_pad, period // 2, d_chunk // 2)
    B = ((B0 + tb - 1) // tb) * tb
    assert B == B0 and l_pad_eff == l_pad, "use aligned experiment shapes"
    D2 = 2 * l_pad_eff
    nd = D2 // d_chunk
    nb = B // tb

    qb0, tb0, q_heads_rev, t_tails, k0, k_end, slack = P._precompute_streams(
        qs, ts, qlens, tlens, K, l_pad_eff, period
    )

    meta_spec = pl.BlockSpec((tb, 1), lambda b, d: (b, 0), memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((tb, K), lambda b, d: (b, 0), memory_space=pltpu.VMEM)
    stream_spec = pl.BlockSpec(
        (tb, period), lambda b, d: (b, (d * d_chunk) // period),
        memory_space=pltpu.VMEM,
    )
    out_shapes = [jax.ShapeDtypeStruct((B, K), jnp.int32)]
    out_specs = [band_spec]
    if with_choices:
        plane_spec = pl.BlockSpec(
            (d_chunk, tb, K), lambda b, d: (d, b, 0), memory_space=pltpu.VMEM
        )
        out_shapes += [jax.ShapeDtypeStruct((D2, B, K), jnp.uint16)]
        out_specs += [plane_spec]
    else:
        dummy_spec = pl.BlockSpec(
            (1, tb, K), lambda b, d: (0, b, 0), memory_space=pltpu.VMEM
        )
        out_shapes += [jax.ShapeDtypeStruct((1, B, K), jnp.uint16)]
        out_specs += [dummy_spec]

    def kern(*refs):
        (qlens_ref, tlens_ref, k0_ref, qb0_ref, tb0_ref, qh, tt,
         sout_ref, choices_ref, *scratch) = refs
        _kernel_v1(
            qlens_ref, tlens_ref, k0_ref, qb0_ref, tb0_ref, qh, tt,
            sout_ref, choices_ref,
            pen=pen, d_chunk=d_chunk, with_choices=with_choices,
            stream_period=period, opt=opt, carry_scratch=tuple(scratch),
        )

    outs = pl.pallas_call(
        kern,
        grid=(nb, nd),
        in_specs=[meta_spec] * 3 + [band_spec] * 2 + [stream_spec] * 2,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((tb, K), jnp.int32),
            pltpu.VMEM((tb, K), jnp.int32),
            pltpu.VMEM((tb, K), jnp.int32),
            pltpu.VMEM((tb, K), jnp.int32),
            pltpu.VMEM((tb, K), jnp.int32),
            pltpu.VMEM((tb, period + K), jnp.int32),
            pltpu.VMEM((tb, K + period), jnp.int32),
            pltpu.VMEM((tb, K), jnp.int32),
        ],
    )(
        qlens[:, None].astype(jnp.int32),
        tlens[:, None].astype(jnp.int32),
        k0[:, None].astype(jnp.int32),
        qb0, tb0, q_heads_rev, t_tails,
    )
    s_final = outs[0]
    c_end = jnp.clip(k_end - k0, 0, K - 1)
    scores = jnp.take_along_axis(s_final, c_end[:, None], axis=1)[:, 0]
    feasible = (jnp.abs(k_end) <= (K - 1)) & (qlens + tlens <= D2)
    scores = jnp.where(feasible, scores, INF)
    return jnp.minimum(scores, INF), outs[1]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    pen = resolve_penalties(parse_scores("0,5,8,2,24,1"))
    B, l_pad, K = 2048, 1024, 128
    qs, ts, qlens, tlens = _batch(B=B, l_pad=l_pad)
    args = tuple(map(jnp.asarray, (qs, ts, qlens, tlens)))

    def timeit(name, f):
        f()
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1000:7.1f} ms  {B/best:8.0f} pairs/s")
        return best

    s_ref = np.asarray(P.dense_forward_pallas(*args, pen, K, l_pad, True)[0])
    timeit("V0 prod (choices) ", lambda: np.asarray(
        P.dense_forward_pallas(*args, pen, K, l_pad, True)[0]))

    s1 = np.asarray(forward_v(*args, pen, K, l_pad, True, False)[0])
    np.testing.assert_array_equal(s1, s_ref)
    timeit("V1 carry (choices)", lambda: np.asarray(
        forward_v(*args, pen, K, l_pad, True, False)[0]))

    s2 = np.asarray(forward_v(*args, pen, K, l_pad, True, True)[0])
    np.testing.assert_array_equal(s2, s_ref)
    timeit("V2 carry+opt      ", lambda: np.asarray(
        forward_v(*args, pen, K, l_pad, True, True)[0]))

    s3 = np.asarray(forward_v(*args, pen, K, l_pad, False, True)[0])
    np.testing.assert_array_equal(s3, s_ref)
    timeit("V3 score-only opt ", lambda: np.asarray(
        forward_v(*args, pen, K, l_pad, False, True)[0]))


if __name__ == "__main__":
    main()
