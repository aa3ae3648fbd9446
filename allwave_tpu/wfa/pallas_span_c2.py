"""Parity-COMPRESSED Pallas span kernel for the segmented engine.

The classic span kernel (pallas_span.py) runs every anti-diagonal step
at the full band width K even though anti-diagonal parity leaves half
the lanes idle each step. This variant packs same-parity diagonals into
KC = K/2 lanes (the layout of pallas_dense's one-shot `_forward_c2`,
sharing its `run_dp_chunk_c2` step body, so cell arithmetic and
tie-breaks have exactly one definition) and starts from an arbitrary
checkpointed band state at a DYNAMIC anti-diagonal offset `d_lo`.

Per step the vector work halves versus the classic span — on the long
low-divergence pairs this engine exists for (100 kb haplotypes,
reference biWFA regime: /root/reference/src/alignment.rs:265-287) the
sweep is the dominant cost, so this is the difference between losing
and winning against a multicore CPU.

State layout: five (B, 2*KC) int32 arrays [even lanes | odd lanes],
where even lane c holds diagonal k = k0 + 2c and odd lane c holds
k = k0 + 2c + 1. Choice planes come back as (n_steps, B, KC) uint16
(low byte: choice/ext bits, high byte: match-run length) — plane row r
holds anti-diagonal d_lo + r + 1, at compressed column (k - k0) >> 1
(every cell a traceback visits has k ≡ d mod 2, so the map is total).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .params import Penalties
from .dense import INF, _band_geometry
from .pallas_dense import (
    LANES,
    PLANE_BYTES_MAX,
    _kc_pad,
    _roll_rows,
    run_dp_chunk_c2,
)

#: widest NOMINAL band for the c2 span kernel: VMEM must hold 10 band
#: scratch planes + 10 in + 10 out halves (as 5 x (tb, 2KC) each way)
#: + registers + streamed plane blocks. At tb=8, KC=8192 that is
#: ~10.5 MB — K = 16384 nominal.
K_MAX_SPAN_C2 = 16384

#: narrowest band worth compressing in the span (same trade as the
#: one-shot C2_MIN_K: below this the lane saving cannot reach a whole
#: 128-lane register and the uncompressed kernel measures faster)
C2_SPAN_MIN_K = 384


def _span_tiles_c2(kc: int, l_pad: int, b: int):
    """(batch_tile, d_chunk, window_lanes) for the c2 span kernel.

    Unlike the one-shot _tiles_for_c2 (which serves huge all-pairs
    batches), span batches are LONG-pair groups of a handful of pairs:
    tb follows the (padded) batch so a 6-pair group runs (8, KC) vector
    ops, not (16, KC) — measured 2x on v5e for config-5b groups."""
    if b <= 8:
        tb = 8
    elif kc <= 8192:
        tb = 16
    else:
        tb = 8
    d = PLANE_BYTES_MAX // (tb * kc)
    d = 1 << max(d.bit_length() - 1, 0)
    d = max(8, min(256, d))
    d = min(d, max(2 * l_pad, 8))
    w = max(d // 2, LANES)
    return tb, d, w


def init_state_c2(B: int, K: int, k0) -> tuple:
    """DP band state at d=0 in c2 layout: 5 x (B, 2*KC) int32."""
    KC = _kc_pad(K)
    ks_e = k0[:, None] + 2 * jnp.arange(KC, dtype=jnp.int32)[None, :]
    se = jnp.where(ks_e == 0, 0, INF).astype(jnp.int32)
    so = jnp.full((B, KC), INF, jnp.int32)
    s0 = jnp.concatenate([se, so], axis=1)
    gap0 = jnp.full((B, 2 * KC), INF, jnp.int32)
    return (s0, gap0, gap0, gap0, gap0)


def read_state_c2(state_s, c, k_width: int):
    """S value at band column c (per pair) from a c2-layout S state."""
    KC = state_s.shape[1] // 2
    packed = (c & 1) * KC + (c >> 1)
    return jnp.take_along_axis(state_s, packed[:, None], axis=1)[:, 0]


def _span_kernel_c2(
    # SMEM scalar: global anti-diagonal of span start
    dlo_ref,
    # per-pair metadata
    qlens_ref,
    tlens_ref,
    k0_ref,
    # checkpointed band state (span start), [even | odd] halves
    s_in,
    i1_in,
    d1_in,
    i2_in,
    d2_in,
    # base registers at d_lo + the span's head/tail byte streams
    qb0_ref,
    tb0_ref,
    qheads_ref,
    ttails_ref,
    # outputs
    s_out,
    i1_out,
    d1_out,
    i2_out,
    d2_out,
    choices_ref,
    # scratch: per-parity bands, registers, run lengths
    se_ref,
    so_ref,
    i1e_ref,
    i1o_ref,
    d1e_ref,
    d1o_ref,
    i2e_ref,
    i2o_ref,
    d2e_ref,
    d2o_ref,
    qb_ref,
    tb_ref,
    rune_ref,
    runo_ref,
    *,
    pen: Penalties,
    k_width: int,
    d_chunk: int,
    with_choices: bool,
    stream_period: int,
):
    KC = se_ref.shape[1]
    W = stream_period
    dch = pl.program_id(1)

    @pl.when(dch == 0)
    def _init():
        for even, odd, src in (
            (se_ref, so_ref, s_in),
            (i1e_ref, i1o_ref, i1_in),
            (d1e_ref, d1o_ref, d1_in),
            (i2e_ref, i2o_ref, i2_in),
            (d2e_ref, d2o_ref, d2_in),
        ):
            even[:] = src[:, :KC]
            odd[:] = src[:, KC:]
        qb_ref[:, W:] = qb0_ref[:]
        tb_ref[:, :KC] = tb0_ref[:]
        # run-length state deliberately resets at segment boundaries
        # (checkpoints don't carry it): a match run crossing the
        # boundary is emitted as two runs with an identical expanded
        # CIGAR — same contract as the classic span kernel
        rune_ref[:] = jnp.zeros_like(rune_ref)
        runo_ref[:] = jnp.zeros_like(runo_ref)

    run_dp_chunk_c2(
        qlens_ref,
        tlens_ref,
        k0_ref,
        qheads_ref,
        ttails_ref,
        choices_ref,
        se_ref,
        so_ref,
        i1e_ref,
        i1o_ref,
        d1e_ref,
        d1o_ref,
        i2e_ref,
        i2o_ref,
        d2e_ref,
        d2o_ref,
        qb_ref,
        tb_ref,
        rune_ref,
        runo_ref,
        pen=pen,
        k_width=k_width,
        d_chunk=d_chunk,
        with_choices=with_choices,
        d_base=dlo_ref[0, 0] + dch * d_chunk,
        stream_period=stream_period,
        local_base=dch * d_chunk,
    )
    for even, odd, dst in (
        (se_ref, so_ref, s_out),
        (i1e_ref, i1o_ref, i1_out),
        (d1e_ref, d1o_ref, d1_out),
        (i2e_ref, i2o_ref, i2_out),
        (d2e_ref, d2o_ref, d2_out),
    ):
        dst[:, :KC] = even[:]
        dst[:, KC:] = odd[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "pen",
        "k_width",
        "l_pad",
        "n_steps",
        "with_choices",
        "interpret",
    ),
)
def dense_span_pallas_c2(
    qs,
    ts,
    qlens,
    tlens,
    pen: Penalties,
    k_width: int,
    l_pad: int,
    d_lo,  # traced scalar, must be even (segments are even-sized)
    n_steps: int,
    state,  # 5 x (B, 2*KC) int32, [even | odd] halves
    with_choices: bool,
    interpret: bool = False,
):
    """Parity-compressed twin of segmented.dense_span_xla. Same DP
    contract; state rides the c2 layout (see module docstring) and the
    choice planes come back compressed, (n_steps, B, KC) uint16."""
    B0 = qs.shape[0]
    K = k_width
    if K % LANES or K > K_MAX_SPAN_C2:
        raise ValueError(
            f"k_width must be a multiple of {LANES} and <= {K_MAX_SPAN_C2}"
        )
    KC = _kc_pad(K)
    L = qs.shape[1]
    tb, d_chunk, period = _span_tiles_c2(KC, l_pad, B0)
    d_chunk = min(d_chunk, n_steps)
    if n_steps % d_chunk:
        raise ValueError(f"n_steps ({n_steps}) % d_chunk ({d_chunk}) != 0")
    if (n_steps // 2) % period:
        raise ValueError(
            f"n_steps/2 ({n_steps//2}) must be a multiple of the stream "
            f"window ({period})"
        )
    B = ((B0 + tb - 1) // tb) * tb
    if B != B0:
        padq = jnp.zeros((B - B0, L), jnp.uint8)
        qs = jnp.concatenate([qs, padq], 0)
        ts = jnp.concatenate([ts, padq], 0)
        padl = jnp.zeros((B - B0,), jnp.int32)
        qlens = jnp.concatenate([qlens, padl], 0)
        tlens = jnp.concatenate([tlens, padl], 0)
        state = tuple(
            jnp.concatenate(
                [c, jnp.full((B - B0, 2 * KC), INF, jnp.int32)], 0
            )
            for c in state
        )
    d_lo = jnp.asarray(d_lo, jnp.int32)
    k_end, k0, slack = _band_geometry(qlens, tlens, K)
    h0 = k0 // 2  # exact: k0 is even
    P = d_lo // 2  # step pairs already consumed before this span

    # live base registers at d_lo: the d=0 registers advanced P times
    # (QB advances at even steps entering lane 0 from the head stream,
    # TB at odd steps entering lane KC-1 from the tail stream; see
    # pallas_dense._precompute_streams_c2 for the d=0 derivation):
    #   QB[c] = rq[(qlen + h0 + c - P) mod L]
    #   TB[c] = t[(h0 + c - 1 + P) mod L]
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    rev_idx = jnp.clip(qlens[:, None] - 1 - idx, 0, L - 1)
    rq = jnp.take_along_axis(qs, rev_idx, axis=1)
    qb0_full = _roll_rows(rq, P - (qlens + h0), L)
    tb0_full = _roll_rows(ts, 1 - h0 - P, L)
    if KC > L:  # cyclic extension; wrapped lanes are always inactive
        reps = -(-KC // L)
        qb0_full = jnp.tile(qb0_full, (1, reps))
        tb0_full = jnp.tile(tb0_full, (1, reps))
    qb0 = qb0_full[:, :KC].astype(jnp.int32)
    tb0 = tb0_full[:, :KC].astype(jnp.int32)

    # entering-byte streams for this span: entries w = P .. P+n_steps/2
    #   heads[w] = q[(w - h0) mod L], tails[w] = t[(w + h0 + KC - 1) mod L]
    n_pairs = n_steps // 2
    q_heads = jax.lax.dynamic_slice_in_dim(
        _roll_rows(qs, h0, L), P, n_pairs, axis=1
    )
    t_tails = jax.lax.dynamic_slice_in_dim(
        _roll_rows(ts, 1 - h0 - KC, L), P, n_pairs, axis=1
    )
    # reverse each refill window of the head stream (fed via roll-right)
    nw = n_pairs // period
    q_heads_rev = (
        q_heads.reshape(B, nw, period)[:, :, ::-1]
        .reshape(B, n_pairs)
        .astype(jnp.int32)
    )
    t_tails = t_tails.astype(jnp.int32)

    nd = n_steps // d_chunk
    nb = B // tb
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    meta_spec = pl.BlockSpec((tb, 1), lambda b, d: (b, 0), memory_space=pltpu.VMEM)
    reg_spec = pl.BlockSpec((tb, KC), lambda b, d: (b, 0), memory_space=pltpu.VMEM)
    band2_spec = pl.BlockSpec(
        (tb, 2 * KC), lambda b, d: (b, 0), memory_space=pltpu.VMEM
    )
    stream_spec = pl.BlockSpec(
        (tb, period),
        lambda b, d: (b, (d * (d_chunk // 2)) // period),
        memory_space=pltpu.VMEM,
    )

    out_shapes = [jax.ShapeDtypeStruct((B, 2 * KC), jnp.int32)] * 5
    out_specs = [band2_spec] * 5
    if with_choices:
        plane_spec = pl.BlockSpec(
            (d_chunk, tb, KC), lambda b, d: (d, b, 0), memory_space=pltpu.VMEM
        )
        out_shapes += [jax.ShapeDtypeStruct((n_steps, B, KC), jnp.uint16)]
        out_specs += [plane_spec]
    else:
        dummy_spec = pl.BlockSpec(
            (1, tb, KC), lambda b, d: (0, b, 0), memory_space=pltpu.VMEM
        )
        out_shapes += [jax.ShapeDtypeStruct((1, B, KC), jnp.uint16)]
        out_specs += [dummy_spec]

    kernel = functools.partial(
        _span_kernel_c2,
        pen=pen,
        k_width=K,
        d_chunk=d_chunk,
        with_choices=with_choices,
        stream_period=period,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nb, nd),
        in_specs=[smem_spec]
        + [meta_spec] * 3
        + [band2_spec] * 5
        + [reg_spec] * 2
        + [stream_spec] * 2,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((tb, KC), jnp.int32)] * 10
        + [
            pltpu.VMEM((tb, period + KC), jnp.int32),  # qb ext register
            pltpu.VMEM((tb, KC + period), jnp.int32),  # tb ext register
            pltpu.VMEM((tb, KC), jnp.int32),  # runlen even
            pltpu.VMEM((tb, KC), jnp.int32),  # runlen odd
        ],
        interpret=interpret,
    )(
        d_lo.reshape(1, 1),
        qlens[:, None].astype(jnp.int32),
        tlens[:, None].astype(jnp.int32),
        k0[:, None].astype(jnp.int32),
        *state,
        qb0,
        tb0,
        q_heads_rev,
        t_tails,
    )
    state_out = tuple(o[:B0] for o in outs[:5])
    if with_choices:
        return state_out, outs[5][:, :B0]
    return state_out, None
