"""Parity tests for the Pallas wavefront-sweep kernel (pallas_wf.py).

Interpret mode on the CPU backend: the kernel's scores, checkpoint ring
images, and replayed history planes must be BIT-identical to the XLA
wavefront engine (wf_segmented.wf_span), which is itself cross-checked
against the oracle and the dense engines. Small window widths force the
slide-DMA path so the windowing machinery is exercised, not just the
fully-resident case."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from allwave_tpu.core.scores import parse_scores
from allwave_tpu.wfa.params import resolve_penalties
from allwave_tpu.wfa import wf_segmented as W
from allwave_tpu.wfa import pallas_wf as P


def _make_batch(seed, L, div=0.03, B=4):
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    qs = np.zeros((B, L), np.uint8)
    ts = np.zeros((B, L), np.uint8)
    qlens = np.zeros((B,), np.int32)
    tlens = np.zeros((B,), np.int32)
    for b in range(B):
        ln = L - int(rng.integers(0, 40))
        s1 = alpha[rng.integers(0, 4, size=ln)]
        s2 = s1.copy()
        nmut = max(1, int(ln * div))
        idx = rng.integers(0, ln, size=nmut)
        s2[idx] = alpha[rng.integers(0, 4, size=nmut)]
        dele = int(rng.integers(1, 6))
        s2 = np.concatenate([s2[: ln // 2], s2[ln // 2 + dele :]])
        ins = alpha[rng.integers(0, 4, size=int(rng.integers(1, 5)))]
        s2 = np.concatenate([s2[: ln // 3], ins, s2[ln // 3 :]])[:L]
        qs[b, : len(s1)] = s1
        ts[b, : len(s2)] = s2
        qlens[b] = len(s1)
        tlens[b] = len(s2)
    return tuple(jnp.asarray(a) for a in (qs, ts, qlens, tlens))


def _xla_reference(qs, ts, qlens, tlens, pen, K, N, C):
    mmw, nxw, ks, h_max, c_end, feasible, buf, done, scores = W.wf_init(
        qs, ts, qlens, tlens, pen, K
    )
    hists = []
    for seg in range(N // C):
        buf, done, scores, hist = W.wf_span(
            mmw, nxw, ks, h_max, c_end, tlens, feasible, jnp.int32(seg * C),
            buf, done, scores, pen=pen, n_steps=C, with_history=True,
        )
        hists.append({c: np.asarray(hist[c]) for c in hist})
    return np.asarray(scores), np.asarray(done), hists


def _run_parity(seed, pen_str, ws, L, K=256, N=64, C=32):
    pen = resolve_penalties(parse_scores(pen_str))
    qs, ts, qlens, tlens = _make_batch(seed, L)
    sx, dx, hists_x = _xla_reference(qs, ts, qlens, tlens, pen, K, N, C)

    old_ws = P._WS
    P._WS = ws
    try:
        (mmt, hmax_r, cmask_r, feas, seeds, done0, scores0, _, _) = P.wf_init_rows(
            qs, ts, qlens, tlens, pen, K, ws
        )
        cks, done_p, scores_p = P.wf_sweep_pallas(
            mmt, hmax_r, cmask_r, tlens, feas, seeds, done0, scores0,
            pen, K, L, N, C, interpret=True,
        )
        assert (np.asarray(scores_p) == sx).all()
        assert (np.asarray(done_p) == dx).all()

        smax = int(sx[dx].max()) if dx.any() else 0
        top = max((smax - 1) // C, 0)
        for seg in sorted({0, top}):
            ck = {c: cks[c][seg] for c in P._COMPS}
            hist_p = P.wf_hist_span_pallas(
                mmt, hmax_r, cmask_r, tlens, feas, jnp.int32(seg * C), ck,
                pen, K, L, C, interpret=True,
            )
            for comp in P._COMPS:
                assert (
                    np.asarray(hist_p[comp]) == hists_x[seg][comp]
                ).all(), f"seg {seg} comp {comp}"
    finally:
        P._WS = old_ws


def test_parity_two_piece_resident_window():
    # window >= whole bitmap: no slides
    _run_parity(0, "0,5,8,2,24,1", 128, 512)


@pytest.mark.slow
def test_parity_edit_distance():
    _run_parity(1, "0,1,1,1", 128, 512)


@pytest.mark.slow
def test_parity_single_affine():
    _run_parity(2, "0,5,8,2", 128, 512)


@pytest.mark.slow
def test_parity_sliding_windows():
    # L >> 32*ws forces the slide-DMA path every few levels
    _run_parity(0, "0,5,8,2,24,1", 32, 2048, N=256)


def test_orchestrator_pallas_route_matches_xla():
    """End-to-end: WavefrontSegmentedAligner(impl='pallas') returns the
    same (score, cigar) as impl='xla' on small long-ish pairs —
    including an identical pair (score 0, pure origin-emit traceback
    from the seed checkpoint)."""
    import os

    pen = resolve_penalties(parse_scores("0,5,8,2,24,1"))
    qs, ts, qlens, tlens = _make_batch(3, 768)
    pairs = [
        (
            bytes(np.asarray(qs[b, : qlens[b]])),
            bytes(np.asarray(ts[b, : tlens[b]])),
        )
        for b in range(4)
    ]
    pairs[3] = (pairs[3][0], pairs[3][0])  # identical pair
    os.environ["ALLWAVE_WF_INTERPRET"] = "1"
    try:
        al_p = W.WavefrontSegmentedAligner(pen, impl="pallas")
        res_p = al_p.align_pairs(pairs, sigma_hint=[120, 120, 120, 120])
    finally:
        del os.environ["ALLWAVE_WF_INTERPRET"]
    al_x = W.WavefrontSegmentedAligner(pen, impl="xla")
    res_x = al_x.align_pairs(pairs, sigma_hint=[120, 120, 120, 120])
    for a, b in zip(res_p, res_x):
        assert (a is None) == (b is None)
        if a is not None:
            assert a[0] == b[0]
            assert np.array_equal(a[1], b[1])
