"""Pallas wavefront (WFA score-sweep) kernel with VMEM-windowed,
gather-free match-run extension.

This is the TPU-native engine for the regime biWFA owns in the
reference (MemoryMode::Ultralow — /root/reference/src/alignment.rs:265-287,
100 kb test at tests/integration_tests.rs:557-597): long, low-divergence
pairs where the alignment score s is much smaller than the length L.
The dense banded engine does O(L*K) cell work regardless of divergence;
this kernel does O(s*K) — at 100 kb / 0.5% divergence that is ~40x
fewer cells — and runs the WHOLE sweep in ONE device dispatch.

Why the previous wavefront path lost (wf_segmented.py, XLA): the greedy
extension needs, per score level, a per-diagonal random read of the
mismatch bitmap. XLA lowers those batched gathers to ~element-at-a-time
code and re-reads a (B, K, L/32) HBM-resident table; measured multiple
ms per level. Here the bitmap lives in HBM TRANSPOSED (word-major), and
each 128-diagonal row keeps a sliding (Ws, 128) VMEM window of it; the
per-lane "gather" is a masked one-hot reduction over the window's
sublane axis — pure VPU work, no gather instruction at all. Window
slides are explicit DMAs issued only for rows whose scan left their
window (rare: the frontier advances monotonically).

Bit-exactness: transitions and extension replicate wf_segmented's
`_wf_step_bm` / `_extend_bm` formulas exactly (same NULL/h_max/trim
semantics, same first-stop arithmetic), so scores, checkpoints, history
planes and therefore CIGARs and PAF bytes are identical to the XLA
engine — which is itself fuzz-checked against the oracle and the dense
engines (tests/test_fuzz_cross_engine.py).

Layout ("rows layout"): a (B, K) plane is stored (B*R, 128) with
R = K/128 — row i = (pair i//R, diagonals 128*(i%R) ..+128). Shifts
along K become a lane shift plus a sublane carry at row boundaries; the
extension window is (B*R, Ws, 128) with the word axis on sublanes.

The rolling score buffer keeps only the lookback each component needs
(m: max_lookback+1 planes; i1/d1: e1+1; i2/d2: e2+1) instead of a
uniform max_lookback+1 for all five — 36 planes instead of 130 for the
default two-piece penalties, which is what lets the state sit in VMEM.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .params import Penalties
from .batch import NULL, _band_geometry, _make_masks

LANES = 128

_COMPS = ("m", "i1", "d1", "i2", "d2")

#: debug-only ablation switches for kernel profiling (scripts/): any of
#: {"noext", "noslide", "nodone", "notrans"} — NEVER set in production
_ABLATE: set = set()


def comp_depths(pen: Penalties) -> Dict[str, int]:
    """Ring depth (number of score planes) each component needs: the
    largest lookback any recurrence reads it at, plus one.
    m is read at s-x, s-(o1+e1), s-(o2+e2); i1/d1 at s-e1; i2/d2 at
    s-e2 (see batch._wavefront_step)."""
    dm = pen.max_lookback + 1
    d1 = pen.e1 + 1
    d2 = (pen.e2 + 1) if pen.two_piece else 1
    return {"m": dm, "i1": d1, "d1": d1, "i2": d2, "d2": d2}


def _rows(x: jnp.ndarray) -> jnp.ndarray:
    """(..., B, K) -> (..., B*R, 128)."""
    K = x.shape[-1]
    B = x.shape[-2]
    R = K // LANES
    return x.reshape(x.shape[:-2] + (B * R, LANES))


def _unrows(x: jnp.ndarray, K: int) -> jnp.ndarray:
    """(..., B*R, 128) -> (..., B, K)."""
    R = K // LANES
    BR = x.shape[-2]
    return x.reshape(x.shape[:-2] + (BR // R, K))


def _pick_tb(K: int, B: int) -> int:
    """Pairs per grid program (power of two): keep tb*R (window/ring
    leading dim) around 32 rows — at 64 the window + rings + Mosaic's
    per-level reduce temporaries measured a 25.9 MB scoped-VMEM stack
    against the 16 MB limit."""
    R = K // LANES
    tb = max(1, 32 // R)
    tb = 1 << (tb.bit_length() - 1)
    while tb > B:
        tb //= 2
    return max(tb, 1)


# ---------------------------------------------------------------------------
# Mismatch bitmap build (XLA, once per group)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k_width", "ws"))
def build_mmt(qs, ts, qlens, tlens, k0, k_width: int, ws: int):
    """Word-major transposed mismatch bitmap: (B, R, LWP, 128) uint32.

    out[b, r, w, l] bit j is set iff extension must STOP at target
    offset h = 32*w + j on band diagonal c = 128*r + l (mismatch, or
    q/t exhausted) — identical bits to wf_segmented.build_mismatch_index
    (same shifted-q construction). Words at w >= L/32 (padding up to
    LWP, a multiple of 8 and >= ws) are all-ones: they encode "stop at
    every h >= l_pad", which reproduces _extend_bm's pos = l_pad
    fallback exactly and lets the window DMA read past L/32 safely."""
    B, L = qs.shape
    K = k_width
    R = K // LANES
    LW = L // 32
    # ALWAYS at least one all-ones pad word past LW: when tlen == l_pad
    # a lane can have no stop bit ahead at all, and the pad is what
    # resolves its scan to pos = l_pad (the _extend_bm fallback value).
    # Multiple of 32 so the phase-packed (lwp/4) axis keeps the int32
    # sublane tiling (8).
    lwp = max(-(-(LW + 1) // 32) * 32, ws)
    pos_ext = jnp.arange(L + K, dtype=jnp.int32)[None, :] - K - k0[:, None]
    q_sh = jnp.take_along_axis(
        jnp.pad(qs, ((0, 0), (0, 1))), jnp.clip(pos_ext, 0, L), axis=1
    )
    warange32 = jnp.arange(LW, dtype=jnp.int32)[None, :] * 32  # (1, LW)
    bitw = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]

    def one_subgroup(sg):
        # PHASE-PACKED block for 32 diagonals c = 32*sg + d: out lane
        # 32*ph + d holds word (4*w4 + ph) of diagonal c. Batching 32
        # diagonals per map step amortizes the per-iteration overhead
        # that dominated the one-diagonal-per-step build (measured
        # ~130 ms per group at K=2048), and packs phases in-block so no
        # full-size transpose of the (B, K, LW) cube is ever needed.
        #
        # Per diagonal, the byte compare + where/sum bit-pack runs at
        # (B, L) size; the range conditions (v < 0, v >= qlen,
        # h >= tlen) apply as prefix/suffix masks in WORD space (their
        # stop range is the contiguous complement of [a, b_hi) below),
        # and compare garbage from clipped q_sh reads is fully covered
        # by those masks. (Measured on v5e: an int8-dot bit-pack was 3x
        # SLOWER — tiny-N matmuls pad terribly — and uint32 SWAR
        # formulations hit pathological multi-minute compiles; the
        # where/sum pack matches the all-elementwise build's speed
        # while keeping the masks off the per-element path.)
        words = []
        for d in range(32):
            c = sg * 32 + d
            qc = jax.lax.dynamic_slice_in_dim(q_sh, K - c, L, axis=1)
            word = jnp.sum(
                jnp.where(
                    (qc != ts).reshape(B, LW, 32), bitw, jnp.uint32(0)
                ),
                axis=2,
                dtype=jnp.uint32,
            ).astype(jnp.int32)
            a = k0 + c  # stop where h < a  (v < 0)
            b_hi = jnp.minimum(tlens, qlens + a)  # stop where h >= b_hi
            pa = jnp.clip(a[:, None] - warange32, 0, 32)
            pre = jnp.where(
                pa >= 32, jnp.int32(-1), (jnp.int32(1) << pa) - 1
            )
            pb = jnp.clip(b_hi[:, None] - warange32, 0, 32)
            suf = jnp.where(
                pb >= 32, jnp.int32(0), ~((jnp.int32(1) << pb) - 1)
            )
            words.append(word | pre | suf)
        wblk = jnp.stack(words)  # (32, B, LW)
        wblk = jnp.pad(
            wblk, ((0, 0), (0, 0), (0, lwp - LW)), constant_values=-1
        )
        wblk = wblk.reshape(32, B, lwp // 4, 4)
        return jnp.transpose(wblk, (1, 2, 3, 0)).reshape(
            B, lwp // 4, LANES
        )

    mm = jax.lax.map(one_subgroup, jnp.arange(K // 32, dtype=jnp.int32))
    return jnp.transpose(mm, (1, 0, 2, 3))  # (B, K/32, lwp/4, 128)


@functools.partial(jax.jit, static_argnames=("pen", "k_width", "ws"))
def wf_init_rows(qs, ts, qlens, tlens, pen: Penalties, k_width: int, ws: int):
    """Group init for the Pallas path. Returns
    (mmt, h_max_rows, cmask_rows, feasible, seeds, done0, scores0,
     c_end, k0) — seeds are RING IMAGES (slot = s % depth), matching
    what the kernel checkpoints, with score 0's extended M plane in
    slot 0 and NULL elsewhere."""
    B, L = qs.shape
    K = k_width
    k_end, k0 = _band_geometry(qlens, tlens, K)
    ks, h_max = _make_masks(qlens, tlens, k0, K)
    c_end = jnp.clip(k_end - k0, 0, K - 1).astype(jnp.int32)
    feasible = jnp.abs(k_end) <= (K - 1)

    mmt = build_mmt(qs, ts, qlens, tlens, k0, K, ws)

    # M at score 0: offset 0 on diagonal 0, extended along it =
    # LCP(q, t) capped by h_max (same value _extend_bm produces)
    i = jnp.arange(L, dtype=jnp.int32)[None, :]
    stop0 = (i >= qlens[:, None]) | (i >= tlens[:, None]) | (qs != ts)
    lcp = jnp.min(jnp.where(stop0, i, L), axis=1)
    c_zero = (-k0).astype(jnp.int32)
    hm_zero = jnp.take_along_axis(h_max, c_zero[:, None], axis=1)[:, 0]
    m0v = jnp.minimum(lcp, hm_zero)
    m0 = jnp.where(
        jnp.arange(K, dtype=jnp.int32)[None, :] == c_zero[:, None], m0v[:, None], NULL
    ).astype(jnp.int32)
    m0 = jnp.where(m0 > h_max, NULL, m0)

    depths = comp_depths(pen)
    seeds = {}
    for comp in _COMPS:
        dep = depths[comp]
        ring = jnp.full((dep, B, K), NULL, jnp.int32)
        if comp == "m":
            ring = ring.at[0].set(m0)
        seeds[comp] = _rows(ring)

    at_end0 = jnp.take_along_axis(m0, c_end[:, None], axis=1)[:, 0]
    done0 = (at_end0 == tlens) & feasible
    scores0 = jnp.where(done0, 0, -1).astype(jnp.int32)
    cmask = (
        jnp.arange(K, dtype=jnp.int32)[None, :] == c_end[:, None]
    ).astype(jnp.int32)
    return (
        mmt,
        _rows(h_max.astype(jnp.int32)),
        _rows(cmask),
        feasible,
        seeds,
        done0,
        scores0,
        c_end,
        k0,
    )


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _ctz32(x):
    """Count trailing zeros of nonzero uint32 x (garbage for x == 0,
    which callers mask out) via the exact float2^k-exponent trick —
    avoids relying on popcount lowering inside Mosaic."""
    low = x & (~x + jnp.uint32(1))  # lowest set bit, a power of two
    f = low.astype(jnp.float32)  # exact for powers of two
    expo = (jax.lax.bitcast_convert_type(f, jnp.int32) >> 23) & 0xFF
    return expo - 127


def _wf_kernel(
    # scalar prefetch / SMEM
    slo_ref,  # (1, 1) int32: span covers scores s_lo+1 .. s_lo+n_steps
    # VMEM per-tile inputs (per-pair values broadcast to rows layout —
    # (tb, 1) blocks are illegal for tb < 8 under Mosaic's block rule)
    hmax_ref,  # (tbR, 128) int32
    cmask_ref,  # (tbR, 128) int32
    tlens_ref,  # (tbR, 128) int32 broadcast
    feas_ref,  # (tbR, 128) int32 broadcast
    done_in,  # (tbR, 128) int32 broadcast
    scores_in,  # (tbR, 128) int32 broadcast
    # HBM (ANY)
    mmt_ref,  # (B, R, LWP, 128) uint32
    sm_ref,
    si1_ref,
    sd1_ref,
    si2_ref,
    sd2_ref,  # seeds: (dep_c, B*R, 128) int32
    # outputs
    ck_m,
    ck_i1,
    ck_d1,
    ck_i2,
    ck_d2,  # (n_ck, dep_c, B*R, 128) int32 ANY (n_ck=1 dummies when unused)
    histp_ref,  # (n_steps|1, 5, B*R, 128) int32 ANY, packed history
    done_out,  # (tbR, 128) int32 VMEM broadcast
    scores_out,  # (tbR, 128) int32 VMEM broadcast
    # scratch
    rm,
    ri1,
    rd1,
    ri2,
    rd2,  # rings: (dep_c, tbR, 128) int32 VMEM
    win_ref,  # (4, ws4, tbR, 128) int32 VMEM, lane-major window
    wbase_ref,  # (tbR, LANES) int32 VMEM (WORD units, subgroup-uniform)
    flag_ref,  # (4, tbR, LANES) int32 VMEM (lane-0-readable roll planes)
    base_ref,  # (4, tbR, LANES) int32 VMEM
    winpos_ref,  # (4, ws4, tbR, 128) int32 VMEM: per-word first-stop pos
    stage_win_ref,  # (ws4, 128) int32 VMEM: slide staging
    pos_ref,  # (tbR, 128) int32 VMEM: extension result (slow-path write-through)
    done_ref,  # (tbR, 1) int32 VMEM (c_end rows only)
    scores_ref,  # (tbR, 1) int32 VMEM (c_end rows only)
    stage_ref,  # (8, 5, tbR, LANES) int32 VMEM: packed history staging
    sem,  # DMA sem ()
    hsem,  # DMA sems (8,) for pipelined history writes
    *,
    pen: Penalties,
    K: int,
    tb: int,
    lwp: int,
    ws: int,
    l_pad: int,
    n_steps: int,
    ckpt_every: int,  # 0 = no checkpoints (history mode)
    with_history: bool,
):
    R = K // LANES
    tbR = tb * R
    depths = comp_depths(pen)
    dm, dg1, dg2 = depths["m"], depths["i1"], depths["i2"]
    rings = {"m": rm, "i1": ri1, "d1": rd1, "i2": ri2, "d2": rd2}
    seeds = {"m": sm_ref, "i1": si1_ref, "d1": sd1_ref, "i2": si2_ref, "d2": sd2_ref}
    cks = {"m": ck_m, "i1": ck_i1, "d1": ck_d1, "i2": ck_i2, "d2": ck_d2}
    b0 = pl.program_id(0) * tbR  # this tile's first row in the global array

    # ---- seed load ----
    for comp in _COMPS:
        cp = pltpu.make_async_copy(
            seeds[comp].at[:, pl.ds(b0, tbR), :], rings[comp], sem
        )
        cp.start()
        cp.wait()
    # non-tracked rows count as done so the all-done skip check is a
    # plain min over the column
    done_ref[:] = jnp.where(
        jnp.max(cmask_ref[:], axis=1, keepdims=True) > 0,
        done_in[:, :1],
        1,
    )
    scores_ref[:] = scores_in[:, :1]
    wbase_ref[:] = jnp.full((tbR, LANES), -2 * ws, jnp.int32)  # "window empty"
    lane32 = jax.lax.broadcasted_iota(jnp.int32, (tbR, LANES), 1) & 31

    def _seg_suffix_prefix(v, combine, shifted_fill):
        """Per-32-lane-subgroup reduction broadcast to every lane of the
        subgroup: a suffix pass then a prefix pass of log-steps (the
        suffix pass puts the full segment reduction at the segment's
        first lane; the prefix pass spreads it, since the first lane's
        value dominates every prefix)."""
        for k in (1, 2, 4, 8, 16):
            sh = pltpu.roll(v, LANES - k, axis=1)  # lane j reads lane j+k
            v = combine(v, jnp.where(lane32 + k < 32, sh, shifted_fill))
        for k in (1, 2, 4, 8, 16):
            sh = pltpu.roll(v, k, axis=1)  # lane j reads lane j-k
            v = combine(v, jnp.where(lane32 >= k, sh, shifted_fill))
        return v

    def seg_min32(v):
        return _seg_suffix_prefix(v, jnp.minimum, jnp.int32(2**30))

    def seg_max32(v):
        return _seg_suffix_prefix(v, jnp.maximum, jnp.int32(-(2**30)))

    row_in_pair = jax.lax.broadcasted_iota(jnp.int32, (tbR, LANES), 0) % R
    lane_full = jax.lax.broadcasted_iota(jnp.int32, (tbR, LANES), 1)
    first_row = row_in_pair == 0
    last_row = row_in_pair == (R - 1)
    NULLv = jnp.int32(NULL)

    def shift_right_k(a):  # out[c] = a[c-1] along the band, NULL in
        lr = pltpu.roll(a, 1, axis=1)  # lr[i, j] = a[i, (j-1) % 128]
        prev = pltpu.roll(lr, 1, axis=0)  # prev[i, j] = a[i-1, (j-1) % 128]
        lane0 = jnp.where(first_row, NULLv, prev)
        return jnp.where(lane_full == 0, lane0, lr)

    def shift_left_k(a):  # out[c] = a[c+1]
        ll = pltpu.roll(a, LANES - 1, axis=1)  # ll[i, j] = a[i, (j+1) % 128]
        nxt = pltpu.roll(ll, tbR - 1, axis=0)  # nxt[i, j] = a[i+1, (j+1) % 128]
        laneL = jnp.where(last_row, NULLv, nxt)
        return jnp.where(lane_full == LANES - 1, laneL, ll)

    def ring_at(comp, s, ds):
        """rings[comp] plane at score s-ds (NULL plane when s < ds)."""
        dep = depths[comp]
        idx = jax.lax.rem(s - ds + dep * 64, dep)  # positive mod
        plane = rings[comp][pl.ds(idx, 1)][0]
        return jnp.where(s >= ds, plane, jnp.full((tbR, LANES), NULL, jnp.int32))

    hmax = hmax_ref[:]
    trim = lambda a: jnp.where(a > hmax, NULL, a)

    # ---- phase-packed window machinery (see build_mmt) ----
    ws4 = ws // 4
    NW = 4 * tbR

    # Window machinery, LANE-MAJOR: win[ph, w4, i, l] = bitmap word
    # (wbase[i, l] + 4*w4 + ph) of row i's diagonal l. Slides DMA the
    # phase-packed HBM block into a staging buffer and un-pack it with
    # four lane rolls PER SLIDE — the previous design's expand/collapse
    # helpers spent ~85 lane rolls per LEVEL (a lane roll measures
    # ~185x a sublane roll on v5e, see pallas_dense.py's transposed
    # kernel notes), which was the entire per-level budget.
    _WCH = min(8, ws4)
    ph_i = jax.lax.broadcasted_iota(jnp.int32, (4, _WCH, tbR, LANES), 0)
    w4_i = jax.lax.broadcasted_iota(jnp.int32, (4, _WCH, tbR, LANES), 1)
    wo_chunk0 = 4 * w4_i + ph_i  # element word offset at chunk base 0
    BIGPOS = jnp.int32(2**30)
    lane_sub = jax.lax.broadcasted_iota(jnp.int32, (ws4, LANES), 1) // 32
    gmask = [lane_sub == g for g in range(4)]

    def do_slides(flag, newbase_w):
        """flag / newbase_w lane-major, subgroup-uniform; newbase_w in
        WORDS, 32-aligned (so the phase-packed source offset keeps its
        sublane tiling). Flagged subgroups re-DMA their window block,
        un-pack it into the lane-major window, and the stop-position
        plane refreshes (rolls-free, chunked)."""
        for g in range(4):
            sh = (LANES - 32 * g) % LANES
            flag_ref[g] = pltpu.roll(flag, sh, axis=1) if sh else flag
            base_ref[g] = (
                pltpu.roll(newbase_w, sh, axis=1) if sh else newbase_w
            )

        # per-phase any-flag gate: a typical fire slides ONE subgroup,
        # so three of the four 32-iteration scalar scans skip entirely
        gany = [
            jnp.max(jnp.where(lane_full // 32 == g, flag, 0)) > 0
            for g in range(4)
        ]
        for g in range(4):  # static: roll amounts and masks depend on g

            def dma_one(i, _, g=g):
                @pl.when(flag_ref[g, i, 0] > 0)
                def _():
                    nb4 = base_ref[g, i, 0] >> 2
                    pair = (b0 + i) // R
                    sg = ((b0 + i) % R) * 4 + g
                    cp = pltpu.make_async_copy(
                        mmt_ref.at[pair, sg, pl.ds(nb4, ws4), :],
                        stage_win_ref,
                        sem,
                    )
                    cp.start()
                    cp.wait()
                    blk = stage_win_ref[:]
                    for ph in range(4):
                        sh = (32 * g - 32 * ph) % LANES
                        v = pltpu.roll(blk, sh, axis=1) if sh else blk
                        cur = win_ref[ph, :, i, :]
                        win_ref[ph, :, i, :] = jnp.where(gmask[g], v, cur)

                return 0

            @pl.when(gany[g])
            def _scan(g=g, dma_one=dma_one):
                jax.lax.fori_loop(0, tbR, dma_one, 0)

        wbase_ref[:] = jnp.where(flag > 0, newbase_w, wbase_ref[:])
        wb = wbase_ref[:]
        for c0 in range(0, ws4, _WCH):
            wchunk = win_ref[:, c0 : c0 + _WCH, :, :]
            idxw = wb[None, None] + wo_chunk0 + 4 * c0
            winpos_ref[:, c0 : c0 + _WCH, :, :] = jnp.where(
                wchunk != 0, (idxw << 5) + _ctz32(wchunk), BIGPOS
            )

    def extend(m_pre, pos_ref):
        """_extend_bm semantics on the sliding subgroup windows.

        Structured for the common case: ONE gather pass against the
        current windows, a single scalar any-unresolved reduction, and
        the entire slide/retry machinery behind a @pl.when that almost
        never fires (the window's ~100-word lookahead makes misses
        ~per-thousand-level events) — the always-on while_loop it
        replaces measured ~9 us/level of carry/branch overhead even
        when it ran zero iterations. pos_ref is a (tbR, 128) scratch
        the slow path writes through."""
        if "noext" in _ABLATE:
            return m_pre
        ok = (m_pre > NULL) & (m_pre <= hmax)
        h0 = jnp.clip(m_pre, 0, l_pad - 1)
        w0 = h0 >> 5
        r = h0 & 31
        first_mask = jnp.int32(-1) << r  # logical low-bits-cleared mask

        def gather_round(sw, pos, unres_i):
            unres = unres_i != 0
            wbase = wbase_ref[:]  # (tbR, LANES), WORD units
            oword = sw - wbase
            swhi = (sw << 5) | 31
            w0w = jnp.zeros((tbR, LANES), jnp.int32)
            p1m = jnp.full((tbR, LANES), BIGPOS, jnp.int32)
            for c0 in range(0, ws4, _WCH):
                wchunk = win_ref[:, c0 : c0 + _WCH, :, :]
                pchunk = winpos_ref[:, c0 : c0 + _WCH, :, :]
                sel0 = (wo_chunk0 + 4 * c0) == oword[None, None]
                w0w = w0w + jnp.sum(jnp.where(sel0, wchunk, 0), axis=(0, 1))
                p1m = jnp.minimum(
                    p1m,
                    jnp.min(
                        jnp.where(
                            pchunk > swhi[None, None], pchunk, BIGPOS
                        ),
                        axis=(0, 1),
                    ),
                )
            inwin = (oword >= 0) & (oword < ws) & unres
            msk = jnp.where(sw == w0, first_mask, jnp.int32(-1))
            m0 = w0w & msk
            have0 = inwin & (m0 != 0)
            have1 = inwin & jnp.logical_not(have0) & (p1m < BIGPOS)
            pos0 = (sw << 5) + _ctz32(m0)
            newpos = jnp.where(have0, pos0, p1m)
            newres = have0 | have1
            pos = jnp.where(unres & newres, newpos, pos)
            # in-window but nothing found: continue scanning past the top
            sw = jnp.where(inwin & jnp.logical_not(newres), wbase + ws, sw)
            unres = unres & jnp.logical_not(newres)
            return sw, pos, unres.astype(jnp.int32)

        # ---- fast path: one gather against the current windows.
        # Lanes whose w0 is outside the window stay unresolved (inwin
        # false) and fall to the slow path below, which slides first —
        # so no separate pre-gather coverage check is needed.
        sw, pos, unres = gather_round(
            w0, jnp.zeros((tbR, LANES), jnp.int32), ok.astype(jnp.int32)
        )
        pos_ref[:] = pos

        if "noslide" not in _ABLATE:
            # each while iteration the lowest unresolved lane of every
            # flagged subgroup either resolves or advances its scan by
            # ~ws words; generous bound so a trip means a logic bug
            max_it = NW + 8 * (lwp // max(ws, 1)) + 64

            @pl.when(jnp.max(unres) > 0)
            def _slow():
                def cond(carry):
                    _, _, u, it = carry
                    return (jnp.max(u) > 0) & (it < max_it)

                def body(carry):
                    sw_, pos_, u, it = carry
                    flag = seg_max32(u)
                    swmin = seg_min32(jnp.where(u != 0, sw_, lwp))
                    newbase_w = jnp.clip(
                        swmin & ~31, 0, max(lwp - ws, 0)
                    )
                    do_slides(flag, newbase_w)
                    sw_, pos_, u = gather_round(sw_, pos_, u)
                    return sw_, pos_, u, it + 1

                _, pos2, _, _ = jax.lax.while_loop(
                    cond, body, (sw, pos, unres, jnp.int32(0))
                )
                pos_ref[:] = pos2

        return jnp.where(ok, jnp.minimum(pos_ref[:], hmax), m_pre)

    o1e1 = pen.o1 + pen.e1
    o2e2 = pen.o2 + pen.e2 if pen.two_piece else 0
    tlens_rows = tlens_ref[:]
    feas_rows = feas_ref[:]
    cmask = cmask_ref[:]
    # done/scores live ONLY on the row holding each pair's end diagonal
    # (c_end): no cross-row reduction needed per level, and rows of
    # batch-padding pairs are treated as done for the skip check
    cend_row = jnp.max(cmask, axis=1, keepdims=True) > 0  # (tbR, 1)
    n_ck = max(n_steps // ckpt_every, 1) if ckpt_every else 0

    def level(j, _):
        s = slo_ref[0, 0] + 1 + j

        def run_level():
            # ---- checkpoint at segment boundaries (sweep mode; slot 0
            # is written unconditionally before the level loop) ----
            if ckpt_every:
                @pl.when((jax.lax.rem(j, ckpt_every) == 0) & (j > 0))
                def _ck():
                    seg = j // ckpt_every
                    for comp in _COMPS:
                        cp = pltpu.make_async_copy(
                            rings[comp],
                            cks[comp].at[seg, :, pl.ds(b0, tbR), :],
                            sem,
                        )
                        cp.start()
                        cp.wait()

            # ---- transitions (identical to batch._wavefront_step) ----
            i1s = jnp.maximum(
                shift_right_k(ring_at("m", s, o1e1)),
                shift_right_k(ring_at("i1", s, pen.e1)),
            )
            i1 = trim(jnp.where(i1s > NULL, i1s + 1, NULL))
            d1 = trim(
                jnp.maximum(
                    shift_left_k(ring_at("m", s, o1e1)),
                    shift_left_k(ring_at("d1", s, pen.e1)),
                )
            )
            best = jnp.maximum(i1, d1)
            if pen.two_piece:
                i2s = jnp.maximum(
                    shift_right_k(ring_at("m", s, o2e2)),
                    shift_right_k(ring_at("i2", s, pen.e2)),
                )
                i2 = trim(jnp.where(i2s > NULL, i2s + 1, NULL))
                d2 = trim(
                    jnp.maximum(
                        shift_left_k(ring_at("m", s, o2e2)),
                        shift_left_k(ring_at("d2", s, pen.e2)),
                    )
                )
                best = jnp.maximum(best, jnp.maximum(i2, d2))
            else:
                i2 = jnp.full((tbR, LANES), NULL, jnp.int32)
                d2 = i2
            mis = ring_at("m", s, pen.x)
            mis = trim(jnp.where(mis > NULL, mis + 1, NULL))
            m_pre = jnp.maximum(best, mis)
            m = trim(extend(m_pre, pos_ref))

            # ---- ring writes + packed history staging ----
            new = {"m": m, "i1": i1, "d1": d1, "i2": i2, "d2": d2}
            for comp in _COMPS:
                dep = depths[comp]
                slot = jax.lax.rem(s, dep)
                rings[comp][pl.ds(slot, 1)] = new[comp][None]

            if with_history:
                pslot = jax.lax.rem(j, 8)

                @pl.when(j >= 8)
                def _wait_prev():
                    # 8-deep staging: the copy being waited on was
                    # issued ~8 levels (~0.1 ms) ago and has long
                    # completed, so the wait never stalls the level
                    pltpu.make_async_copy(
                        stage_ref.at[pslot],
                        histp_ref.at[j - 8, :, pl.ds(b0, tbR), :],
                        hsem.at[pslot],
                    ).wait()

                for ci, comp in enumerate(_COMPS):
                    stage_ref[pslot, ci] = new[comp]
                pltpu.make_async_copy(
                    stage_ref.at[pslot],
                    histp_ref.at[j, :, pl.ds(b0, tbR), :],
                    hsem.at[pslot],
                ).start()

            # ---- done / scores (tracked on the c_end row only) ----
            if "nodone" in _ABLATE:
                return
            masked = jnp.where(cmask != 0, m, NULL)
            at_end = jnp.max(masked, axis=1, keepdims=True)  # (tbR, 1)
            done_now = (
                (at_end == tlens_rows[:, :1])
                & (feas_rows[:, :1] != 0)
                & (done_ref[:] == 0)
                & cend_row
            )
            scores_ref[:] = jnp.where(done_now, s, scores_ref[:])
            done_ref[:] = jnp.where(done_now, 1, done_ref[:])

        run_level()
        return 0

    if ckpt_every:
        # checkpoint slot 0 = the seed ring image, written even when
        # every pair is already done at score 0 (the early-exit while
        # below would then never run a level; the orchestrator still
        # replays segment 0 for the origin emits)
        for comp in _COMPS:
            cp = pltpu.make_async_copy(
                rings[comp], cks[comp].at[0, :, pl.ds(b0, tbR), :], sem
            )
            cp.start()
            cp.wait()

    if with_history:
        # replay spans always run every level
        jax.lax.fori_loop(0, n_steps, level, 0)
    else:
        # sweep: STOP at the first level where every tracked pair is
        # done — a generous s_cap then costs nothing at all (the old
        # per-level skip branch still measured ~3 us/tile-level)
        def lcond(j):
            return (j < n_steps) & (jnp.min(done_ref[:]) == 0)

        def lbody(j):
            level(j, 0)
            return j + 1

        jax.lax.while_loop(lcond, lbody, jnp.int32(0))

    # drain outstanding history DMAs (history mode never skips levels)
    if with_history:
        for j_last in range(max(n_steps - 8, 0), n_steps):
            pslot = j_last % 8
            pltpu.make_async_copy(
                stage_ref.at[pslot],
                histp_ref.at[j_last, :, pl.ds(b0, tbR), :],
                hsem.at[pslot],
            ).wait()

    done_out[:] = jnp.broadcast_to(done_ref[:], (tbR, LANES))
    scores_out[:] = jnp.broadcast_to(scores_ref[:], (tbR, LANES))


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------


def _call_kernel(
    mmt,
    h_max_rows,
    cmask_rows,
    tlens,
    feasible,
    s_lo,
    seeds,
    done,
    scores,
    pen: Penalties,
    k_width: int,
    l_pad: int,
    n_steps: int,
    ckpt_every: int,
    with_history: bool,
    interpret: bool,
):
    B = tlens.shape[0]
    K = k_width
    R = K // LANES
    lwp = mmt.shape[2] * 4
    ws = min(int(_WS), lwp)
    if K % LANES:
        raise ValueError(f"k_width must be a multiple of {LANES}")
    if l_pad % 32 or l_pad < 32:
        raise ValueError("l_pad must be a multiple of 32 and >= 32")
    if ws % 32:
        raise ValueError("window width must be a multiple of 32 words")
    if ckpt_every and n_steps % ckpt_every:
        raise ValueError("n_steps must be a multiple of ckpt_every")
    tb = _pick_tb(K, B)
    if B % tb:
        raise ValueError(f"B ({B}) must be a multiple of tb ({tb})")
    nb = B // tb
    tbR = tb * R
    depths = comp_depths(pen)

    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    # explicitly HBM, not ANY: the compiler places fitting ANY outputs
    # in VMEM, which blew the 16 MB budget with the checkpoint arrays
    any_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    rows_spec = pl.BlockSpec((tbR, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM)

    def col_rows(x):  # (B,) per-pair -> (B*R, 128) broadcast, rows layout
        return jnp.broadcast_to(
            jnp.repeat(x.astype(jnp.int32), R)[:, None], (B * R, LANES)
        )

    n_ck = max(n_steps // ckpt_every, 1) if ckpt_every else 1
    ck_shapes = [
        jax.ShapeDtypeStruct(
            (n_ck if ckpt_every else 1, depths[c], B * R, LANES), jnp.int32
        )
        for c in _COMPS
    ]
    hist_shapes = [
        jax.ShapeDtypeStruct(
            (n_steps if with_history else 1, 5, B * R, LANES), jnp.int32
        )
    ]

    kernel = functools.partial(
        _wf_kernel,
        pen=pen,
        K=K,
        tb=tb,
        lwp=lwp,
        ws=ws,
        l_pad=l_pad,
        n_steps=n_steps,
        ckpt_every=ckpt_every,
        with_history=with_history,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[smem_spec] + [rows_spec] * 6 + [any_spec] * 6,
        out_specs=[any_spec] * 6 + [rows_spec, rows_spec],
        out_shape=ck_shapes
        + hist_shapes
        + [
            jax.ShapeDtypeStruct((B * R, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B * R, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((depths["m"], tbR, LANES), jnp.int32),
            pltpu.VMEM((depths["i1"], tbR, LANES), jnp.int32),
            pltpu.VMEM((depths["d1"], tbR, LANES), jnp.int32),
            pltpu.VMEM((depths["i2"], tbR, LANES), jnp.int32),
            pltpu.VMEM((depths["d2"], tbR, LANES), jnp.int32),
            pltpu.VMEM((4, ws // 4, tbR, LANES), jnp.int32),
            pltpu.VMEM((tbR, LANES), jnp.int32),
            pltpu.VMEM((4, tbR, LANES), jnp.int32),
            pltpu.VMEM((4, tbR, LANES), jnp.int32),
            pltpu.VMEM((4, ws // 4, tbR, LANES), jnp.int32),
            pltpu.VMEM((ws // 4, LANES), jnp.int32),
            pltpu.VMEM((tbR, LANES), jnp.int32),
            pltpu.VMEM((tbR, 1), jnp.int32),
            pltpu.VMEM((tbR, 1), jnp.int32),
            pltpu.VMEM((8, 5, tbR, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        jnp.asarray(s_lo, jnp.int32).reshape(1, 1),
        h_max_rows,
        cmask_rows,
        col_rows(tlens),
        col_rows(feasible),
        col_rows(done),
        col_rows(scores),
        mmt,
        *[seeds[c] for c in _COMPS],
    )
    cks = dict(zip(_COMPS, outs[0:5]))
    histp = outs[5]
    # done/scores are tracked on each pair's c_end row
    rowhas = jnp.max(cmask_rows, axis=1).reshape(B, R)
    cend_rows = jnp.argmax(rowhas, axis=1).astype(jnp.int32)
    rowsel = jnp.arange(B, dtype=jnp.int32) * R + cend_rows
    done_o = outs[6][rowsel, 0] > 0
    scores_o = outs[7][rowsel, 0]
    return cks, histp, done_o, scores_o


#: extension window width in 32-bit words per 32-diagonal subgroup.
#: Sizing (scripts/prof_window2.py, 100 kb @0.5% pairwise divergence):
#: a 32-diagonal subgroup's frontier spans ~35-90 words, and the
#: window must ALSO give the subgroup's leading lane enough lookahead
#: that match runs rarely overrun the top — every overrun fires the
#: slide/retry loop, whose per-fire cost (~10 us) dominated the sweep
#: at 128 words (one long run somewhere in the batch per level).
#: 192 words leaves >=100 words (~3200 bases) of lookahead past the
#: subgroup spread: overruns become ~per-thousand-level events.
#: Misses stay correct regardless (the slide loop re-DMAs and
#: retries).
_WS = 192


@functools.partial(
    jax.jit,
    static_argnames=("pen", "k_width", "l_pad", "n_steps", "ckpt_every", "interpret"),
)
def wf_sweep_pallas(
    mmt,
    h_max_rows,
    cmask_rows,
    tlens,
    feasible,
    seeds,
    done,
    scores,
    pen: Penalties,
    k_width: int,
    l_pad: int,
    n_steps: int,
    ckpt_every: int,
    interpret: bool = False,
):
    """Score-only sweep of n_steps levels from score 0 in ONE dispatch,
    checkpointing the ring state every ckpt_every levels. Returns
    (ckpts, done, scores); ckpts[comp][seg] is the ring image at score
    seg*ckpt_every (seg 0 = the seeds). Levels after all pairs finish
    are skipped in-kernel, so a generous n_steps costs ~nothing."""
    cks, _, done_o, scores_o = _call_kernel(
        mmt,
        h_max_rows,
        cmask_rows,
        tlens,
        feasible,
        jnp.int32(0),
        seeds,
        done,
        scores,
        pen,
        k_width,
        l_pad,
        n_steps,
        ckpt_every,
        False,
        interpret,
    )
    return cks, done_o, scores_o


@functools.partial(
    jax.jit, static_argnames=("pen", "k_width", "l_pad", "n_steps", "interpret")
)
def wf_hist_span_pallas(
    mmt,
    h_max_rows,
    cmask_rows,
    tlens,
    feasible,
    s_lo,
    ckpt,  # ring images at score s_lo (dict comp -> (dep, B*R, 128))
    pen: Penalties,
    k_width: int,
    l_pad: int,
    n_steps: int,
    interpret: bool = False,
):
    """Replay n_steps levels from a checkpoint WITH history planes:
    returns dict comp -> (n_steps, B, K) int32, row j = score s_lo+1+j
    (same contract as wf_segmented.wf_span's hist)."""
    B = tlens.shape[0]
    dummy_done = jnp.zeros((B,), jnp.int32)
    dummy_scores = jnp.full((B,), -1, jnp.int32)
    _, histp, _, _ = _call_kernel(
        mmt,
        h_max_rows,
        cmask_rows,
        tlens,
        jnp.zeros((B,), jnp.int32),
        s_lo,
        ckpt,
        dummy_done,
        dummy_scores,
        pen,
        k_width,
        l_pad,
        n_steps,
        0,
        True,
        interpret,
    )
    return {
        c: _unrows(histp[:, ci], k_width) for ci, c in enumerate(_COMPS)
    }


@functools.partial(jax.jit, static_argnames=("pen", "k_width", "D"))
def ckpt_to_buf(ckpt, s_lo, pen: Penalties, k_width: int, D: int):
    """Expand a ring-image checkpoint into wf_segmented's full-depth
    (D, B, K) rolling-buffer dict (slot = s % D), NULL in slots beyond
    each component's depth. Slots older than a component's lookback are
    never read by the DP or the traceback window (documented in
    comp_depths), so NULL there preserves bit-exactness."""
    depths = comp_depths(pen)
    out = {}
    for comp in _COMPS:
        dep = depths[comp]
        planes = _unrows(ckpt[comp], k_width)  # (dep, B, K)
        B, K = planes.shape[1:]
        buf = jnp.full((D, B, K), NULL, jnp.int32)
        lags = jnp.arange(dep, dtype=jnp.int32)
        src_slots = jnp.mod(s_lo - lags, dep)
        dst_slots = jnp.mod(s_lo - lags, D)
        buf = buf.at[dst_slots].set(planes[src_slots])
        out[comp] = buf
    return out
