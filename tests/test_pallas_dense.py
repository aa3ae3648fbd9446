"""Parity tests for the Pallas dense-band kernel (interpreter mode on
CPU) against the portable XLA scan engine.

Contract: scores and certificates are bit-identical; the choices planes
agree at every cell the traceback can visit, which we assert by running
the SAME traceback over both planes and requiring identical run buffers
(the planes may differ at inactive/out-of-matrix cells because the
Pallas stream precompute wraps indices where the XLA engine clips —
those bytes are never read)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from allwave_tpu.core.scores import parse_scores
from allwave_tpu.wfa import dense as D_
from allwave_tpu.wfa import pallas_dense as P_
from allwave_tpu.wfa.params import resolve_penalties


def _random_batch(rng, B, L, l_pad, div=0.05):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    qlens = rng.randint(L // 2, L + 1, B).astype(np.int32)
    tlens = (qlens + rng.randint(-6, 7, B)).clip(8, L).astype(np.int32)
    qs = np.zeros((B, l_pad), np.uint8)
    ts = np.zeros((B, l_pad), np.uint8)
    for b in range(B):
        q = rng.choice(bases, qlens[b])
        if tlens[b] <= qlens[b]:
            t = q[: tlens[b]].copy()
        else:
            t = np.concatenate([q, rng.choice(bases, tlens[b] - qlens[b])])
        mut = rng.rand(tlens[b]) < div
        t[mut] = rng.choice(bases, mut.sum())
        qs[b, : qlens[b]] = q
        ts[b, : tlens[b]] = t
    return qs, ts, qlens, tlens


@pytest.mark.parametrize(
    "scores_str", ["0,5,8,2,24,1", "0,4,6,2", "0,1,1,1"]
)
def test_pallas_forward_matches_xla(scores_str):
    pen = resolve_penalties(parse_scores(scores_str))
    rng = np.random.RandomState(11)
    l_pad = K = 128
    qs, ts, qlens, tlens = _random_batch(rng, 5, 96, l_pad)
    args = tuple(map(jnp.asarray, (qs, ts, qlens, tlens)))

    sa, ca, cha = D_.dense_forward(*args, pen, K, l_pad, True)
    sp, cp, chp = P_.dense_forward_pallas(
        *args, pen, K, l_pad, True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sp))
    np.testing.assert_array_equal(np.asarray(ca), np.asarray(cp))

    run_cap = 2 * l_pad + 8
    ta = D_.dense_traceback(cha, sa, args[2], args[3], pen, run_cap)
    tp = D_.dense_traceback(
        chp,
        sp,
        args[2],
        args[3],
        pen,
        run_cap,
        k_width=K,
        compressed=P_.uses_compressed_planes(K),
        transposed=P_.uses_transposed_planes(K),
    )
    for xa, xp in zip(ta, tp):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xp))


@pytest.mark.parametrize("K,l_pad,div", [(384, 256, 0.15), (512, 128, 0.2)])
def test_pallas_compressed_matches_xla(K, l_pad, div):
    """The parity-compressed kernel (used for K > T_MAX_K in
    production; exercised here directly at small shapes) — planes are
    ~K/2 wide, traceback uses compressed addressing; results must stay
    bit-identical to the XLA engine (covers the KC padding case K=384
    -> KC=256 and the band-wider-than-matrix case K=512, l_pad=128)."""
    pen = resolve_penalties(parse_scores("0,5,8,2,24,1"))
    rng = np.random.RandomState(17)
    qs, ts, qlens, tlens = _random_batch(rng, 5, (l_pad * 3) // 4, l_pad, div)
    args = tuple(map(jnp.asarray, (qs, ts, qlens, tlens)))
    sa, ca, cha = D_.dense_forward(*args, pen, K, l_pad, True)
    sp, cp, chp = P_._forward_c2(
        *args, pen, K, l_pad, True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sp))
    np.testing.assert_array_equal(np.asarray(ca), np.asarray(cp))
    run_cap = 2 * l_pad + 8
    ta = D_.dense_traceback(cha, sa, args[2], args[3], pen, run_cap)
    tp = D_.dense_traceback(
        chp, sp, args[2], args[3], pen, run_cap, k_width=K, compressed=True
    )
    for xa, xp in zip(ta, tp):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xp))


@pytest.mark.parametrize(
    "scores_str,K,l_pad,div",
    [
        ("0,5,8,2,24,1", 128, 128, 0.05),
        ("0,5,8,2,24,1", 384, 256, 0.15),
        ("0,4,6,2", 256, 128, 0.2),
        ("0,1,1,1", 128, 96, 0.1),
    ],
)
def test_pallas_t2_matches_xla(scores_str, K, l_pad, div, monkeypatch):
    """The opt-in TRANSPOSED + parity-compressed kernel ('t2', env
    ALLWAVE_T2=1): kept as an alternate rung for TPU generations where
    halved tick count beats its extra per-tick ops — must stay
    bit-identical to the XLA engine (scores, certificates, and the runs
    a traceback over its planes produces)."""
    monkeypatch.setattr(P_, "_T2_DISABLED", False)
    monkeypatch.setattr(P_, "_T_DISABLED", False)
    jax.clear_caches()  # routing is baked into traces
    try:
        pen = resolve_penalties(parse_scores(scores_str))
        rng = np.random.RandomState(23)
        qs, ts, qlens, tlens = _random_batch(
            rng, 5, (l_pad * 3) // 4, l_pad, div
        )
        args = tuple(map(jnp.asarray, (qs, ts, qlens, tlens)))
        assert P_._route(K) == "t2"
        sa, ca, cha = D_.dense_forward(*args, pen, K, l_pad, True)
        sp, cp, chp = P_._forward_t2(
            *args, pen, K, l_pad, True, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sp))
        np.testing.assert_array_equal(np.asarray(ca), np.asarray(cp))
        run_cap = 2 * l_pad + 8
        ta = D_.dense_traceback(cha, sa, args[2], args[3], pen, run_cap)
        tp = D_.dense_traceback(
            chp,
            sp,
            args[2],
            args[3],
            pen,
            run_cap,
            k_width=K,
            compressed=True,
            transposed=True,
        )
        for xa, xp in zip(ta, tp):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xp))
    finally:
        jax.clear_caches()  # don't leak t2-routed traces to other tests


def test_pallas_pads_batch_and_length():
    """B not a multiple of 32 and l_pad < 128 are padded internally."""
    pen = resolve_penalties(parse_scores("0,5,8,2,24,1"))
    rng = np.random.RandomState(3)
    l_pad = 64
    qs, ts, qlens, tlens = _random_batch(rng, 3, 48, l_pad)
    args = tuple(map(jnp.asarray, (qs, ts, qlens, tlens)))
    sa, ca, _ = D_.dense_forward(*args, pen, 128, l_pad, False)
    sp, cp, _ = P_.dense_forward_pallas(
        *args, pen, 128, l_pad, False, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sp))
    np.testing.assert_array_equal(np.asarray(ca), np.asarray(cp))


def test_dense_align_packed_roundtrip():
    """The pooled, packed single-transfer entry point decodes to the
    same results as the unpacked path."""
    pen = resolve_penalties(parse_scores("0,5,8,2,24,1"))
    rng = np.random.RandomState(5)
    l_pad = K = 128
    qs, ts, qlens, tlens = _random_batch(rng, 4, 100, l_pad)
    run_cap = 64

    pool = np.concatenate([qs, ts], 0)
    qidx = np.arange(4, dtype=np.int32)
    tidx = np.arange(4, 8, dtype=np.int32)
    packed = np.asarray(
        D_.dense_align_packed(
            jnp.asarray(pool),
            jnp.asarray(qidx),
            jnp.asarray(tidx),
            jnp.asarray(qlens),
            jnp.asarray(tlens),
            pen,
            K,
            l_pad,
            run_cap,
            "xla",
        )
    )
    meta = packed[:, :32].copy().view(np.int32).reshape(-1, 8)
    # traceback ops travel 2-bit packed (4 per byte); unpack like the
    # engine's collect path does
    from allwave_tpu.wfa.dense_engine import _OPS_UNPACK_LUT

    cap4 = (run_cap + 3) // 4
    ops = _OPS_UNPACK_LUT[packed[:, 32 : 32 + cap4]].reshape(
        packed.shape[0], 4 * cap4
    )[:, :run_cap]
    lens = packed[:, 32 + cap4 :]

    args = tuple(map(jnp.asarray, (qs, ts, qlens, tlens)))
    scores, cert, ops2, lens2, nruns2, ovf2 = (
        np.asarray(x)
        for x in D_.dense_align(*args, pen, K, l_pad, run_cap, "xla")
    )
    np.testing.assert_array_equal(meta[:, 0], scores)
    np.testing.assert_array_equal(meta[:, 1], nruns2)
    np.testing.assert_array_equal(meta[:, 2], cert.astype(np.int32))
    np.testing.assert_array_equal(meta[:, 3], ovf2.astype(np.int32))
    # 2-bit packing has no spare code for "empty": positions past nruns
    # unpack to 'M' bytes — only the first nruns ops are meaningful
    valid = np.arange(run_cap)[None, :] < nruns2[:, None]
    np.testing.assert_array_equal(np.where(valid, ops, 0), np.where(valid, ops2, 0))
    np.testing.assert_array_equal(np.where(valid, lens, 0), np.where(valid, lens2, 0))
    # device-reduced PAF stat columns == host reductions over the runs
    l64 = lens2.astype(np.int64)
    m = np.where((ops2 == ord("M")) & valid, l64, 0).sum(1)
    x = np.where((ops2 == ord("X")) & valid, l64, 0).sum(1)
    i = np.where((ops2 == ord("I")) & valid, l64, 0).sum(1)
    d = np.where((ops2 == ord("D")) & valid, l64, 0).sum(1)
    np.testing.assert_array_equal(meta[:, 4], m)
    np.testing.assert_array_equal(meta[:, 5], m + x)
    np.testing.assert_array_equal(meta[:, 6], m + x + d)
    np.testing.assert_array_equal(meta[:, 7], m + x + i)


def test_engine_pallas_impl_matches_xla_impl():
    """DenseBandAligner with impl=pallas (interpret unavailable here, so
    only run when a TPU backend exists) — on CPU this exercises the
    impl plumbing with xla."""
    from allwave_tpu.wfa.dense_engine import DenseBandAligner, DenseConfig

    pen = resolve_penalties(parse_scores("0,5,8,2,24,1"))
    rng = np.random.RandomState(9)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    pairs = []
    for _ in range(6):
        q = rng.choice(bases, rng.randint(60, 120)).tobytes()
        t = bytearray(q)
        for p in range(0, len(t), 17):
            t[p] = bases[rng.randint(4)]
        pairs.append((q, bytes(t)))
    al = DenseBandAligner(pen, DenseConfig(impl="xla", run_cap_initial=16))
    out = al.align_pairs(pairs)
    # tiny run cap forces the overflow->full-cap escalation path
    assert all(r is not None for r in out)
    al2 = DenseBandAligner(pen, DenseConfig(impl="xla"))
    out2 = al2.align_pairs(pairs)
    for a, b in zip(out, out2):
        assert a[0] == b[0]
        np.testing.assert_array_equal(a[1], b[1])


def test_engine_fallback_ladder_lands_on_xla(monkeypatch):
    """If Pallas dispatch raises at execution (Mosaic rejection on a
    new TPU generation), align_pairs retries: transposed off first,
    then the portable XLA scan — the caller sees correct results, not
    the exception. Forcing impl=pallas on the CPU backend reproduces
    the failure (non-interpret Pallas TPU kernels cannot run here)."""
    from allwave_tpu.wfa import pallas_dense as P
    from allwave_tpu.wfa.dense_engine import DenseBandAligner, DenseConfig

    monkeypatch.setattr(P, "_T_DISABLED", False)
    # force the device path: cold-shape rounds otherwise route to the
    # host oracle and never hit the failing Pallas dispatch
    monkeypatch.setenv("ALLWAVE_NATIVE_COLD", "0")
    monkeypatch.setenv("ALLWAVE_NATIVE_ESC", "0")
    pen = resolve_penalties(parse_scores("0,5,8,2,24,1"))
    rng = np.random.RandomState(21)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    pairs = []
    for _ in range(4):
        q = rng.choice(bases, rng.randint(80, 150)).tobytes()
        t = bytearray(q)
        for p in range(0, len(t), 23):
            t[p] = bases[rng.randint(4)]
        pairs.append((q, bytes(t)))
    al = DenseBandAligner(pen, DenseConfig(impl="pallas"))
    out = al.align_pairs(pairs)
    assert al.impl == "xla"  # ladder bottomed out on the portable engine
    ref = DenseBandAligner(pen, DenseConfig(impl="xla")).align_pairs(pairs)
    for a, b in zip(out, ref):
        assert a[0] == b[0]
        np.testing.assert_array_equal(a[1], b[1])


@pytest.mark.parametrize("scores_str", ["0,5,8,2,24,1", "0,4,6,2"])
def test_segmented_c2_span_matches_xla(scores_str, monkeypatch):
    """The parity-compressed span path (sweep checkpoints, merged u16
    replay planes, compressed-column traceback) is bit-exact vs the XLA
    segmented engine end-to-end, across segment boundaries, for both
    penalty modes — including a high-divergence pair (escalation) and
    an identical pair (score 0)."""
    from allwave_tpu.wfa.params import resolve_penalties
    from allwave_tpu.wfa.segmented import (
        SegmentedConfig,
        SegmentedDenseAligner,
    )

    monkeypatch.setenv("ALLWAVE_SPAN_INTERPRET", "1")
    pen = resolve_penalties(parse_scores(scores_str))
    rng = np.random.RandomState(31)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    pairs = []
    for _ in range(3):
        L = rng.randint(380, 520)
        q = rng.choice(bases, L)
        t = q.copy()
        mut = rng.rand(L) < 0.03
        t[mut] = rng.choice(bases, mut.sum())
        t = np.concatenate([t[:100], t[103:]])  # deletion
        t = np.concatenate([t[:50], rng.choice(bases, 4), t[50:]])  # insert
        pairs.append((q.tobytes(), t.tobytes()))
    hi = rng.choice(bases, 450)
    pairs.append((hi.tobytes(), rng.choice(bases, 430).tobytes()))  # unrelated
    pairs.append((pairs[0][0], pairs[0][0]))  # identical

    seg_x = SegmentedDenseAligner(
        pen, SegmentedConfig(ckpt_every=256, impl="xla")
    )
    seg_c = SegmentedDenseAligner(
        pen, SegmentedConfig(ckpt_every=256, impl="c2")
    )
    a = seg_x.align_pairs(pairs)
    b = seg_c.align_pairs(pairs)
    for x, y in zip(a, b):
        assert (x is None) == (y is None)
        if x is not None:
            assert x[0] == y[0]
            np.testing.assert_array_equal(x[1], y[1])
