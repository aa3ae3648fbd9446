"""Narrow-band (sub-band) replay of the dense segmented engine.

The traceback replay only needs diagonals within the walker's influence
cone (+-C per segment), so wide-band groups replay a ~2C-wide per-pair
sub-band instead of the full K (segmented._replay_tb_block /
pallas_span.dense_span_pallas_sub). These tests pin the two contracts:

1. plane-level: the sub-band span's choice/run planes equal the
   full-band span's on every in-cone cell (the only cells the walk
   reads);
2. end-to-end: the Pallas narrow path and the XLA full path produce
   identical (score, CIGAR) on workloads whose band exceeds k_sub.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from allwave_tpu.core.scores import parse_scores
from allwave_tpu.testing.synth import MutationConfig, make_test_case
from allwave_tpu.wfa.params import resolve_penalties

PEN = resolve_penalties(parse_scores("0,5,8,2,24,1"))


def _mk_batch(seed, n, length, div):
    cfg = MutationConfig(
        snp_rate=div, insertion_rate=div / 20, deletion_rate=div / 20
    )
    case = make_test_case(seed=seed, n_sequences=n, length=length, cfg=cfg)
    return [s.seq for s in case.sequences]


def test_sub_span_planes_match_full_in_cone():
    """dense_span_pallas_sub's planes == the full-band span's on every
    cell at distance > level from the sub-band edges."""
    from allwave_tpu.wfa.pallas_dense import _band_geometry
    from allwave_tpu.wfa.pallas_span import (
        dense_span_pallas,
        dense_span_pallas_sub,
        make_group_streams,
    )
    from allwave_tpu.wfa.segmented import dense_sweep_ckpt

    seqs = _mk_batch(91, 2, 1000, 0.05)
    l_pad = 1024
    K, k_sub, C = 1024, 512, 128
    B = 2
    qs = np.zeros((B, l_pad), np.uint8)
    ts = np.zeros((B, l_pad), np.uint8)
    qs[0, : len(seqs[0])] = np.frombuffer(seqs[0], np.uint8)
    ts[0, : len(seqs[1])] = np.frombuffer(seqs[1], np.uint8)
    qs[1, : len(seqs[1])] = np.frombuffer(seqs[1], np.uint8)
    ts[1, : len(seqs[0])] = np.frombuffer(seqs[0], np.uint8)
    qlens = jnp.asarray(
        [len(seqs[0]), len(seqs[1])], jnp.int32
    )
    tlens = jnp.asarray(
        [len(seqs[1]), len(seqs[0])], jnp.int32
    )
    qsj, tsj = jnp.asarray(qs), jnp.asarray(ts)

    _, _, ckpts = dense_sweep_ckpt(
        qsj, tsj, qlens, tlens, PEN, K, l_pad, C, impl="xla"
    )
    k_end, k0, _ = _band_geometry(qlens, tlens, K)
    gs = make_group_streams(qsj, tsj, qlens, tlens, K, l_pad)

    for seg, c_lo_v in ((3, (128, 256)), (7, (0, 384)), (1, (512, 256))):
        state = tuple(c[seg] for c in ckpts)
        _, full = dense_span_pallas(
            qsj, tsj, qlens, tlens, PEN, K, l_pad,
            jnp.int32(seg * C), C, state, True, interpret=True,
        )
        c_lo = jnp.asarray(c_lo_v, jnp.int32)
        state_s = tuple(
            np.stack(
                [
                    np.asarray(comp_arr)[b, c_lo_v[b] : c_lo_v[b] + k_sub]
                    for b in range(B)
                ]
            )
            for comp_arr in state
        )
        _, sub = dense_span_pallas_sub(
            gs, qlens, tlens, k0, c_lo, PEN, K, k_sub, l_pad,
            jnp.int32(seg * C), C, tuple(jnp.asarray(s) for s in state_s),
            True, interpret=True,
        )
        fc, fr = (np.asarray(x) for x in full)
        sc, sr = (np.asarray(x) for x in sub)
        bad = 0
        for j in range(C):
            m = j + 2  # influence-cone margin at this level
            lo, hi = m, k_sub - 1 - m
            if hi <= lo:
                continue
            for b in range(B):
                g0 = c_lo_v[b]
                if not np.array_equal(
                    sc[j, b, lo:hi], fc[j, b, g0 + lo : g0 + hi]
                ):
                    bad += 1
                if not np.array_equal(
                    sr[j, b, lo:hi], fr[j, b, g0 + lo : g0 + hi]
                ):
                    bad += 1
        assert bad == 0, f"seg {seg}: {bad} in-cone plane rows differ"


@pytest.mark.slow
def test_narrow_replay_end_to_end_matches_xla():
    """SegmentedDenseAligner with the Pallas narrow replay ==
    the XLA full-band path, on a workload whose band (K=1024+) exceeds
    the sub-band width (ckpt_every=256 -> k_sub=896)."""
    import os

    from allwave_tpu.wfa.segmented import (
        SegmentedConfig,
        SegmentedDenseAligner,
    )

    seqs = _mk_batch(92, 4, 1800, 0.05)
    pairs = [
        (seqs[i], seqs[j]) for i in range(4) for j in range(4) if i != j
    ]
    hints = [int(0.1 * 1800 * 5 + 32)] * len(pairs)
    os.environ["ALLWAVE_SPAN_INTERPRET"] = "1"
    try:
        al_p = SegmentedDenseAligner(
            PEN, SegmentedConfig(ckpt_every=256, impl="pallas")
        )
        out_p = al_p.align_pairs(pairs, sigma_hint=hints)
    finally:
        del os.environ["ALLWAVE_SPAN_INTERPRET"]
    al_x = SegmentedDenseAligner(
        PEN, SegmentedConfig(ckpt_every=256, impl="xla")
    )
    out_x = al_x.align_pairs(pairs, sigma_hint=hints)
    for a, b in zip(out_p, out_x):
        assert (a is None) == (b is None)
        if a is None:
            continue
        assert a[0] == b[0]
        np.testing.assert_array_equal(a[1], b[1])
