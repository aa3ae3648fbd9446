"""Pallas span kernel for the segmented (checkpoint–replay) engine.

Same VMEM-resident DP loop as pallas_dense (the step body is shared via
`run_dp_chunk`), but the sweep starts from an arbitrary checkpointed
band state at a DYNAMIC anti-diagonal offset `d_lo` (one compiled kernel
serves every segment), and the five component states come back out so
the caller can checkpoint them. See segmented.py for the algorithm.
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
    K_MAX,
    _roll_rows,
    _tiles_for,
    run_dp_chunk,
)


def _span_kernel(
    # scalar prefetch-style SMEM input
    dlo_ref,  # (1, 1) int32: global anti-diagonal of span start
    # per-pair metadata
    qlens_ref,
    tlens_ref,
    k0_ref,
    # checkpointed band state (span start)
    s_in,
    i1_in,
    d1_in,
    i2_in,
    d2_in,
    # base registers + per-step byte streams for this span
    qb0_ref,
    tb0_ref,
    qheads_ref,
    ttails_ref,
    # outputs: state at span end + choice/run planes
    s_out,
    i1_out,
    d1_out,
    i2_out,
    d2_out,
    choices_ref,
    runs_ref,
    # scratch
    s_ref,
    i1_ref,
    d1_ref,
    i2_ref,
    d2_ref,
    qb_ref,
    tb_ref,
    run_ref,
    *,
    pen: Penalties,
    d_chunk: int,
    with_choices: bool,
    stream_period: int = 0,
):
    K = s_ref.shape[1]
    W = stream_period or d_chunk
    dch = pl.program_id(1)

    @pl.when(dch == 0)
    def _init():
        s_ref[:] = s_in[:]
        i1_ref[:] = i1_in[:]
        d1_ref[:] = d1_in[:]
        i2_ref[:] = i2_in[:]
        d2_ref[:] = d2_in[:]
        qb_ref[:, W:] = qb0_ref[:]
        tb_ref[:, :K] = tb0_ref[:]
        # run-length state deliberately resets at segment boundaries:
        # checkpoints don't carry it; a match run crossing the boundary
        # is emitted as two runs, whose expanded CIGAR is identical
        run_ref[:] = jnp.zeros_like(run_ref)

    run_dp_chunk(
        qlens_ref,
        tlens_ref,
        k0_ref,
        qheads_ref,
        ttails_ref,
        choices_ref,
        runs_ref,
        s_ref,
        i1_ref,
        d1_ref,
        i2_ref,
        d2_ref,
        qb_ref,
        tb_ref,
        run_ref,
        pen=pen,
        d_chunk=d_chunk,
        with_choices=with_choices,
        d_base=dlo_ref[0, 0] + dch * d_chunk,
        stream_period=stream_period,
        local_base=dch * d_chunk,  # streams are sliced from d_lo
    )
    s_out[:] = s_ref[:]
    i1_out[:] = i1_ref[:]
    d1_out[:] = d1_ref[:]
    i2_out[:] = i2_ref[:]
    d2_out[:] = d2_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("pen", "k_width", "l_pad", "n_steps", "with_choices", "interpret"),
)
def dense_span_pallas(
    qs,
    ts,
    qlens,
    tlens,
    pen: Penalties,
    k_width: int,
    l_pad: int,
    d_lo,  # traced scalar
    n_steps: int,
    state,  # (S, I1, D1, I2, D2) each (B, K) int32
    with_choices: bool,
    interpret: bool = False,
):
    """Pallas twin of segmented.dense_span_xla (same contract). B must
    be a multiple of the tile for the band width; n_steps a multiple of
    the d-chunk (segments sized by the orchestrator)."""
    B = qs.shape[0]
    K = k_width
    if K % LANES or K > K_MAX:
        raise ValueError(f"k_width must be a multiple of {LANES} and <= {K_MAX}")
    tb, d_chunk, period = _tiles_for(K, l_pad)
    d_chunk = min(d_chunk, n_steps)
    period = min(period, n_steps)  # block == full span is always legal
    if n_steps % d_chunk or n_steps % period or period % d_chunk:
        raise ValueError(
            f"n_steps ({n_steps}) must be a multiple of the d-chunk "
            f"({d_chunk}) and the stream period ({period})"
        )
    B0 = B
    B = ((B0 + tb - 1) // tb) * tb
    if B != B0:  # pad the batch to the pair tile
        padq = jnp.zeros((B - B0, qs.shape[1]), jnp.uint8)
        qs = jnp.concatenate([qs, padq], 0)
        ts = jnp.concatenate([ts, padq], 0)
        padl = jnp.zeros((B - B0,), jnp.int32)
        qlens = jnp.concatenate([qlens, padl], 0)
        tlens = jnp.concatenate([tlens, padl], 0)
        state = tuple(
            jnp.concatenate([c, jnp.full((B - B0, K), INF, jnp.int32)], 0)
            for c in state
        )
    D2 = 2 * l_pad
    d_lo = jnp.asarray(d_lo, jnp.int32)
    k_end, k0, slack = _band_geometry(qlens, tlens, K)

    # base registers at d_lo and the span's head/tail byte streams —
    # same per-row circular-shift construction as pallas_dense, with the
    # d_lo offset folded into the shifts / the stream slice
    qrep = jnp.repeat(qs, 2, axis=1)
    trep = jnp.repeat(ts, 2, axis=1)
    qrep_rev = qrep[:, ::-1]
    qb0_full = _roll_rows(qrep_rev, d_lo - 1 - k0, D2)
    tb0_full = _roll_rows(trep, 2 - k0 - d_lo, D2)
    if K > D2:  # cyclic extension; wrapped lanes are always inactive
        reps = -(-K // D2)
        qb0_full = jnp.tile(qb0_full, (1, reps))
        tb0_full = jnp.tile(tb0_full, (1, reps))
    qb0 = qb0_full[:, :K].astype(jnp.int32)
    tb0 = tb0_full[:, :K].astype(jnp.int32)
    q_heads = jax.lax.dynamic_slice_in_dim(
        _roll_rows(qrep, 1 + k0, D2), d_lo, n_steps, axis=1
    )
    t_tails = jax.lax.dynamic_slice_in_dim(
        _roll_rows(trep, 2 - K - k0, D2), d_lo, n_steps, axis=1
    )
    nd = n_steps // d_chunk
    nw = n_steps // period
    q_heads_rev = (
        q_heads.reshape(B, nw, period)[:, :, ::-1]
        .reshape(B, n_steps)
        .astype(jnp.int32)
    )
    t_tails = t_tails.astype(jnp.int32)

    outs = _span_call(
        qb0, tb0, q_heads_rev, t_tails, qlens, tlens, k0, d_lo, state,
        pen, K, tb, d_chunk, period, n_steps, with_choices, interpret,
    )
    state_out = tuple(o[:B0] for o in outs[:5])
    if with_choices:
        return state_out, (outs[5][:, :B0], outs[6][:, :B0])
    return state_out, None


def _span_call(
    qb0, tb0, q_heads_rev, t_tails, qlens, tlens, k0, d_lo, state,
    pen, K, tb, d_chunk, period, n_steps, with_choices, interpret,
):
    """The pallas_call shared by both span wrappers (inputs already
    padded to the pair tile and sliced/reversed for this span)."""
    B = qb0.shape[0]
    nd = n_steps // d_chunk
    nb = B // tb
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    meta_spec = pl.BlockSpec((tb, 1), lambda b, d: (b, 0), memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((tb, K), lambda b, d: (b, 0), memory_space=pltpu.VMEM)
    stream_spec = pl.BlockSpec(
        (tb, period),
        lambda b, d: (b, (d * d_chunk) // period),
        memory_space=pltpu.VMEM,
    )

    out_shapes = [jax.ShapeDtypeStruct((B, K), jnp.int32)] * 5
    out_specs = [band_spec] * 5
    if with_choices:
        plane_spec = pl.BlockSpec(
            (d_chunk, tb, K), lambda b, d: (d, b, 0), memory_space=pltpu.VMEM
        )
        out_shapes += [
            jax.ShapeDtypeStruct((n_steps, B, K), jnp.uint8),
            jax.ShapeDtypeStruct((n_steps, B, K), jnp.uint8),
        ]
        out_specs += [plane_spec, plane_spec]
    else:
        dummy_spec = pl.BlockSpec(
            (1, tb, K), lambda b, d: (0, b, 0), memory_space=pltpu.VMEM
        )
        out_shapes += [
            jax.ShapeDtypeStruct((1, B, K), jnp.uint8),
            jax.ShapeDtypeStruct((1, B, K), jnp.uint8),
        ]
        out_specs += [dummy_spec, dummy_spec]

    kernel = functools.partial(
        _span_kernel,
        pen=pen,
        d_chunk=d_chunk,
        with_choices=with_choices,
        stream_period=period,
    )
    return pl.pallas_call(
        kernel,
        grid=(nb, nd),
        in_specs=[smem_spec]
        + [meta_spec] * 3
        + [band_spec] * 5
        + [band_spec] * 2
        + [stream_spec] * 2,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((tb, K), jnp.int32),  # S
            pltpu.VMEM((tb, K), jnp.int32),  # I1
            pltpu.VMEM((tb, K), jnp.int32),  # D1
            pltpu.VMEM((tb, K), jnp.int32),  # I2
            pltpu.VMEM((tb, K), jnp.int32),  # D2
            pltpu.VMEM((tb, period + K), jnp.int32),  # qb ext register
            pltpu.VMEM((tb, K + period), jnp.int32),  # tb ext register
            pltpu.VMEM((tb, K), jnp.int32),  # runlen
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


# ---------------------------------------------------------------------------
# Hoisted group streams: the per-span XLA stream precompute above costs
# ~8 ms per call at 100 kb shapes (four _roll_rows passes over (B, 2L)
# arrays) — 64 sweep spans + ~49 replay spans re-derived IDENTICAL
# structures from scratch, 113x. make_group_streams builds them ONCE
# per dispatch group; per span the wrapper below only takes four cheap
# dynamic slices. The Pallas kernel itself is byte-identical.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k_width", "l_pad"))
def make_group_streams(qs, ts, qlens, tlens, k_width: int, l_pad: int):
    """Once-per-group stream/register precompute for dense_span_pallas_pre.

    Returns (q_heads_rev, t_tails, qb0d, tb0d) — all uint8:
      q_heads_rev (B, 2L): head stream, reversed per `period` window
          aligned to d = 0 (spans start at multiples of the segment
          size, itself a multiple of the period, so alignment holds);
      t_tails     (B, 2L): tail stream;
      qb0d, tb0d  (B, 4L): DOUBLED register bases so any span start can
          slice its K live register lanes without modular arithmetic:
          qb0 at d_lo = qb0d[:, 2L - d_lo : 2L - d_lo + K],
          tb0 at d_lo = tb0d[:, d_lo : d_lo + K].

    B must already be a multiple of the pair tile; requires K <= 2L
    (always true for the long-pair groups this path serves)."""
    K = k_width
    B = qs.shape[0]
    D2 = 2 * l_pad
    if K > D2:
        raise ValueError(f"group streams need K ({K}) <= 2*l_pad ({D2})")
    tb, d_chunk, period = _tiles_for(K, l_pad)
    k_end, k0, slack = _band_geometry(qlens, tlens, K)

    qrep = jnp.repeat(qs, 2, axis=1)  # (B, 2L)
    trep = jnp.repeat(ts, 2, axis=1)
    qrep_rev = qrep[:, ::-1]

    q_heads = _roll_rows(qrep, 1 + k0, D2)
    nw = D2 // period
    q_heads_rev = q_heads.reshape(B, nw, period)[:, :, ::-1].reshape(B, D2)
    t_tails = _roll_rows(trep, 2 - K - k0, D2)

    qb0_base = _roll_rows(qrep_rev, -(1 + k0), D2)
    tb0_base = _roll_rows(trep, 2 - k0, D2)
    qb0d = jnp.concatenate([qb0_base, qb0_base], axis=1)
    tb0d = jnp.concatenate([tb0_base, tb0_base], axis=1)
    return q_heads_rev, t_tails, qb0d, tb0d


@functools.partial(
    jax.jit,
    static_argnames=(
        "pen", "k_full", "k_sub", "l_pad", "n_steps", "with_choices",
        "interpret",
    ),
)
def dense_span_pallas_sub(
    streams,  # make_group_streams output, built at the FULL band width
    qlens,
    tlens,
    k0_full,  # (B,) full-band origin from _band_geometry(.., k_full)
    c_lo,  # (B,) per-pair sub-band origin (diagonals), 128/period-aligned
    pen: Penalties,
    k_full: int,
    k_sub: int,
    l_pad: int,
    d_lo,  # traced scalar, multiple of the stream period
    n_steps: int,
    state_sub,  # (S, I1, D1, I2, D2) each (B, k_sub), pre-sliced at c_lo
    with_choices: bool,
    interpret: bool = False,
):
    """Replay a span over a per-pair SUB-BAND [c_lo, c_lo + k_sub) of
    the full k_full band, reusing the group streams built at k_full.

    The stream/register recipes are linear in the band origin, so the
    sub-band's inputs are plain slices of the (doubled) group streams
    at +c_lo offsets: qb0 at (2L - d_lo) + c_lo, tb0 at d_lo + c_lo,
    heads at (d_lo - c_lo) mod 2L, tails at (d_lo + c_lo + k_sub -
    k_full) mod 2L — verified cell-for-cell against the full-band span
    in tests/test_segmented_narrow.py. c_lo must be aligned to the
    stream period (the head stream's window reversal). Cells outside
    the influence cone of the sub-band seed differ from the full band
    (edge inflow is INF); callers must only read in-cone cells (the
    traceback's reads all are — see segmented._replay_tb_block)."""
    q_heads_all, t_tails_all, qb0d, tb0d = streams
    B = qlens.shape[0]
    D2 = 2 * l_pad
    _, _, period = _tiles_for(k_full, l_pad)
    tb, d_chunk_s, _ = _tiles_for(k_sub, l_pad)
    d_chunk = min(d_chunk_s, period, n_steps)
    while tb > 1 and B % tb:
        tb //= 2
    if n_steps % d_chunk or n_steps % period or period % d_chunk:
        raise ValueError(
            f"n_steps ({n_steps}) must be a multiple of the d-chunk "
            f"({d_chunk}) and the stream period ({period})"
        )
    if 128 % period:
        # c_lo is 128-aligned by the caller; the head-stream window
        # reversal requires the slice offset be period-aligned
        raise ValueError(f"sub-band slicing needs period | 128, got {period}")
    d_lo = jnp.asarray(d_lo, jnp.int32)
    c_lo = c_lo.astype(jnp.int32)
    k0s = (k0_full + c_lo).astype(jnp.int32)

    qh2 = jnp.concatenate([q_heads_all, q_heads_all], axis=1)
    tt2 = jnp.concatenate([t_tails_all, t_tails_all], axis=1)

    def sl(x, off, n):
        return jax.lax.dynamic_slice_in_dim(x, off, n, axis=0)

    q_heads_rev = jax.vmap(sl, in_axes=(0, 0, None))(
        qh2, jnp.mod(d_lo - c_lo, D2), n_steps
    ).astype(jnp.int32)
    t_tails = jax.vmap(sl, in_axes=(0, 0, None))(
        tt2, jnp.mod(d_lo + c_lo + (k_sub - k_full), D2), n_steps
    ).astype(jnp.int32)
    qb0 = jax.vmap(sl, in_axes=(0, 0, None))(
        qb0d, D2 - d_lo + c_lo, k_sub
    ).astype(jnp.int32)
    tb0 = jax.vmap(sl, in_axes=(0, 0, None))(
        tb0d, d_lo + c_lo, k_sub
    ).astype(jnp.int32)

    outs = _span_call(
        qb0, tb0, q_heads_rev, t_tails, qlens, tlens, k0s, d_lo,
        state_sub, pen, k_sub, tb, d_chunk, period, n_steps,
        with_choices, interpret,
    )
    state_out = tuple(outs[:5])
    if with_choices:
        return state_out, (outs[5], outs[6])
    return state_out, None


@functools.partial(
    jax.jit,
    static_argnames=(
        "pen", "k_width", "l_pad", "n_steps", "with_choices", "interpret"
    ),
)
def dense_span_pallas_pre(
    streams,  # (q_heads_rev, t_tails, qb0d, tb0d) from make_group_streams
    qlens,
    tlens,
    pen: Penalties,
    k_width: int,
    l_pad: int,
    d_lo,  # traced scalar, multiple of the stream period
    n_steps: int,
    state,  # (S, I1, D1, I2, D2) each (B, K) int32, B tile-padded
    with_choices: bool,
    interpret: bool = False,
):
    """dense_span_pallas with the group-level precompute hoisted out:
    same kernel, same outputs, ~zero per-span XLA prep."""
    q_heads_all, t_tails_all, qb0d, tb0d = streams
    B = qlens.shape[0]
    K = k_width
    D2 = 2 * l_pad
    tb, d_chunk, period = _tiles_for(K, l_pad)
    d_chunk = min(d_chunk, n_steps)
    if B % tb:
        raise ValueError(f"B ({B}) must be a multiple of the pair tile ({tb})")
    # period is NOT reduced to n_steps here: the global head stream was
    # reversed at this exact window size, so spans must keep it (and
    # therefore be at least one window long)
    if n_steps % d_chunk or n_steps % period or period % d_chunk:
        raise ValueError(
            f"n_steps ({n_steps}) must be a multiple of the d-chunk "
            f"({d_chunk}) and the stream period ({period})"
        )
    d_lo = jnp.asarray(d_lo, jnp.int32)
    k_end, k0, slack = _band_geometry(qlens, tlens, K)

    q_heads_rev = jax.lax.dynamic_slice_in_dim(
        q_heads_all, d_lo, n_steps, axis=1
    ).astype(jnp.int32)
    t_tails = jax.lax.dynamic_slice_in_dim(
        t_tails_all, d_lo, n_steps, axis=1
    ).astype(jnp.int32)
    qb0 = jax.lax.dynamic_slice_in_dim(
        qb0d, D2 - d_lo, K, axis=1
    ).astype(jnp.int32)
    tb0 = jax.lax.dynamic_slice_in_dim(
        tb0d, d_lo, K, axis=1
    ).astype(jnp.int32)

    outs = _span_call(
        qb0, tb0, q_heads_rev, t_tails, qlens, tlens, k0, d_lo, state,
        pen, K, tb, d_chunk, period, n_steps, with_choices, interpret,
    )
    state_out = tuple(outs[:5])
    if with_choices:
        return state_out, (outs[5], outs[6])
    return state_out, None
