"""Host orchestration for the dense banded engine + the unified
length-routed aligner.

DenseBandAligner is TRACE-FIRST: one fused device dispatch per batch
runs forward + on-device traceback at the initial band width; pairs
whose banded score carries the optimality certificate are done, the
rest escalate to a wider band computed directly from their banded score
(banded >= true score, so the jump is conservative).  At pangenome
divergences almost every pair certifies at the first K, so the common
case costs exactly one device round trip — this matters doubly over a
tunneled TPU where every dispatch and transfer has real latency.

Engine selection: the Pallas VMEM-resident kernel on TPU backends, the
portable XLA scan elsewhere (override with ALLWAVE_DENSE_IMPL=xla|pallas).

UnifiedAligner routes short pairs to the dense engine (L*K work, zero
gathers, single scan) and long pairs to the wavefront engine (s*K work).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from .params import Penalties
from . import dense as D_
from .batch import expand_runs_batch
from .engine import BatchWavefrontAligner, EngineConfig


@dataclass
class DenseConfig:
    k_initial: int = 128
    k_max: int = 1 << 14
    #: memory budget for the (2L, B, K) choice+runlen planes of one batch
    choices_budget_bytes: int = 4 << 30
    max_batch: int = 4096
    #: run buffer width fetched per pair; overflowing pairs (rare — more
    #: mutation events than this) rerun with the full 2L+8 cap
    run_cap_initial: int = 128
    #: forward engine: None = auto (pallas on TPU, xla elsewhere)
    impl: Optional[str] = None


def _auto_impl() -> str:
    env = os.environ.get("ALLWAVE_DENSE_IMPL")
    if env in ("xla", "pallas"):
        return env
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


class DenseBandAligner:
    def __init__(self, pen: Penalties, config: Optional[DenseConfig] = None):
        from ..utils.jaxcache import enable_compilation_cache

        enable_compilation_cache()
        self.pen = pen
        self.config = config or DenseConfig()
        self.impl = self.config.impl or _auto_impl()

    @staticmethod
    def _next_pow2(n: int) -> int:
        return 1 << max(n - 1, 1).bit_length() if n > 2 else max(n, 1)

    #: accepted band widths: 128-lane multiples on a {1, 1.5} x pow2
    #: ladder — Mosaic only needs K % 128 == 0, and the finer ladder
    #: saves up to 25% band work vs pure powers of two
    K_LADDER = sorted(
        {128 << i for i in range(8)} | {384 << i for i in range(6)}
    )

    def _round_k(self, k: int) -> int:
        """Smallest accepted band width >= k."""
        for v in self.K_LADDER:
            if v >= k:
                return v
        return self.K_LADDER[-1]

    def _k_for_score(self, sigma: int, kend_abs: int) -> int:
        """Smallest accepted band width whose exit-and-return
        certificate holds for a banded score sigma: the bound is
        2*g(W+1) with g(n) = min(o1+n*e1, o2+n*e2), so we need the
        minimal n with g(n) >= sigma//2 + 1 on BOTH pieces."""
        t = sigma // 2 + 1
        n = max(1, -(-(t - self.pen.o1) // self.pen.e1))
        if self.pen.two_piece:
            n = max(n, -(-(t - self.pen.o2) // self.pen.e2))
        w = n - 1
        k = kend_abs + 2 * max(w, 0) + 3
        return min(
            self._round_k(max(k, self.config.k_initial)), self.config.k_max
        )

    def _round_ks(self, k: np.ndarray) -> np.ndarray:
        """Vectorized _round_k over an int64 array."""
        ladder = np.asarray(self.K_LADDER, dtype=np.int64)
        idx = np.searchsorted(ladder, k).clip(0, ladder.size - 1)
        return ladder[idx]

    def _k_for_scores(self, sigma: np.ndarray, kend_abs: np.ndarray) -> np.ndarray:
        """Vectorized _k_for_score (same formula element-for-element)."""
        t = sigma // 2 + 1
        n1 = np.maximum(1, -(-(t - self.pen.o1) // self.pen.e1))
        if self.pen.two_piece:
            n1 = np.maximum(n1, -(-(t - self.pen.o2) // self.pen.e2))
        w = n1 - 1
        k = kend_abs + 2 * np.maximum(w, 0) + 3
        return np.minimum(
            self._round_ks(np.maximum(k, self.config.k_initial)),
            self.config.k_max,
        )

    def _build_pool(self, pairs: List[Tuple[bytes, bytes]], l_pad: int):
        """ONE device-resident UNIQUE-sequence pool per align_pairs
        call + per-pair row indices: all-pairs workloads reference each
        sequence ~2(n-1) times, so this sends kilobytes over the
        ~40 MB/s driver tunnel instead of megabytes of duplicated rows,
        and every dispatch group of the call shares the same upload."""
        import jax.numpy as jnp

        pool_map: Dict[bytes, int] = {}
        for q, t in pairs:
            for sq in (q, t):
                if sq not in pool_map:
                    pool_map[sq] = len(pool_map)
        p_pad = self._next_pow2(max(len(pool_map), 1))
        pool = np.zeros((p_pad, l_pad), dtype=np.uint8)
        for sq, r in pool_map.items():
            pool[r, : len(sq)] = np.frombuffer(sq, dtype=np.uint8)
        qidx = np.array([pool_map[q] for q, _ in pairs], dtype=np.int32)
        tidx = np.array([pool_map[t] for _, t in pairs], dtype=np.int32)
        qlens = np.array([len(q) for q, _ in pairs], dtype=np.int32)
        tlens = np.array([len(t) for _, t in pairs], dtype=np.int32)
        return (jnp.asarray(pool), qidx, tidx, qlens, tlens)

    def align_pairs(
        self,
        pairs: List[Tuple[bytes, bytes]],
        with_stats: bool = False,
        sigma_hint=None,
    ):
        """[(score, cigar)] in input order (None = failed). With
        with_stats=True also returns an (n, 4) int64 array of
        [num_matches, alignment_length, query_len, target_len] computed
        vectorized from the run buffers (zeros for failed rows).

        sigma_hint: optional per-pair estimated alignment scores (e.g.
        from mash distances) — each pair starts at the band width its
        estimate certifies instead of one global initial K. Wrong hints
        only cost an escalation round; results stay exact."""
        n = len(pairs)
        results: List[Optional[Tuple[int, np.ndarray]]] = [None] * n
        stats = np.zeros((n, 4), dtype=np.int64)
        if n == 0:
            return (results, stats) if with_stats else results

        qlens_all = np.fromiter(
            (len(q) for q, _ in pairs), dtype=np.int64, count=n
        )
        tlens_all = np.fromiter(
            (len(t) for _, t in pairs), dtype=np.int64, count=n
        )
        self._lens = (qlens_all, tlens_all)
        sum_lens = qlens_all + tlens_all
        kend_abs_all = np.abs(tlens_all - qlens_all)
        max_len = int(max(qlens_all.max(), tlens_all.max()))
        l_pad = self._next_pow2(max(max_len, 4))

        k0 = max(
            self._round_k(self.config.k_initial),
            self._round_k(int(kend_abs_all.max()) + 2),
        )
        # a band of k_full diagonals covers the whole matrix — widening
        # past it is pointless (the full-cover certificate always fires)
        k_full = self._round_k(max(int(sum_lens.max()) + 1, 2))
        k0 = min(k0, k_full)
        # run buffers must scale with length: a pure-match CIGAR already
        # needs L/255 runs, and event counts grow with L (a too-small cap
        # silently doubles work via the overflow->full-cap rerun)
        cap0 = min(
            max(self.config.run_cap_initial, l_pad // 8), 2 * l_pad + 8
        )
        # rounds keyed by (band, run_cap): trace-first at (k0, cap0);
        # certificate failures jump straight to the band their banded
        # score certifies (or double, if unreachable); run-buffer
        # overflows rerun at the full cap
        if sigma_hint is None:
            rounds: Dict[Tuple[int, int], List[int]] = {
                (k0, cap0): list(range(n))
            }
        else:
            # vectorized _k_for_score over the whole batch (the scalar
            # loop was ~25 ms at 16k pairs)
            ks = self._k_for_scores(
                np.asarray(sigma_hint, dtype=np.int64), kend_abs_all
            )
            ks = np.maximum(ks, self._round_k(self.config.k_initial))
            ks = np.maximum(ks, self._round_ks(kend_abs_all + 2))
            ks = np.minimum(ks, self._round_ks(sum_lens + 1))
            rounds = {}
            order = np.argsort(ks, kind="stable")
            bounds = np.searchsorted(ks[order], np.unique(ks))
            uniq_ks = np.unique(ks)
            for b, kv in enumerate(uniq_ks):
                hi = bounds[b + 1] if b + 1 < len(bounds) else n
                rounds[(int(kv), cap0)] = order[bounds[b] : hi].tolist()
        self._pool = self._build_pool(pairs, l_pad)

        # coalesce small hint-rounds into the next wider band: a tiny
        # round costs a full dispatch + tunnel round trip (~35 ms) but
        # only ~size/batch of extra compute when merged upward (wider
        # bands are always exact; certificates only get easier)
        if len(rounds) > 1:
            for key in sorted(rounds):
                if key not in rounds or len(rounds) == 1:
                    continue
                if len(rounds[key]) >= 512:
                    continue
                larger = [
                    kk
                    for kk in rounds
                    if kk[1] == key[1] and kk[0] > key[0]
                ]
                if larger:
                    rounds[min(larger)].extend(rounds.pop(key))

        # software pipeline with a DEPTH-2 in-flight queue carried
        # ACROSS band rounds: up to three groups are enqueued on the
        # device before the first collect blocks, so every tunnel
        # round trip except the last overlaps device compute
        # (explicit copy_to_host_async measured SLOWER over the axon
        # tunnel — the plain queue is the win)
        from collections import deque

        inflight = deque()  # (group, device_buf, k, cap)

        def _drain_one():
            g, buf, kk, cc = inflight.popleft()
            for i, key in self._collect_group(
                pairs, g, buf, results, stats, kk, cc, l_pad
            ):
                rounds.setdefault(key, []).append(i)

        while rounds or inflight:
            if not rounds:
                _drain_one()
                continue
            k, cap = min(rounds)
            idxs = rounds.pop((k, cap))
            if k > self.config.k_max:
                continue  # overflow: left as None (failed pair contract)
            per_pair = 2 * (2 * max(l_pad, 128) * k)  # choices+runlen planes
            bsz = int(
                max(
                    1,
                    min(
                        self.config.choices_budget_bytes // per_pair,
                        self.config.max_batch,
                    ),
                )
            )
            # clamp to a power of two: groups pad to the next pow2, so a
            # non-pow2 bsz would allocate up to 2x the planned planes
            bsz = 1 << (bsz.bit_length() - 1)
            ia = np.asarray(idxs, dtype=np.int64)
            qlens_all, tlens_all = self._lens
            idxs = ia[
                np.argsort(qlens_all[ia] + tlens_all[ia], kind="stable")
            ].tolist()
            for lo in range(0, len(idxs), bsz):
                group = idxs[lo : lo + bsz]
                dispatched = self._dispatch_group(pairs, group, k, cap, l_pad)
                inflight.append((group, dispatched, k, cap))
                while len(inflight) > 2:
                    _drain_one()
        return (results, stats) if with_stats else results

    def _dispatch_group(self, pairs, group, k, run_cap, l_pad):
        """Enqueue one fused forward+traceback dispatch (the sequence
        pool is already device-resident — see _build_pool); returns the
        in-flight device buffer (not yet transferred)."""
        import jax.numpy as jnp

        pool_dev, qidx, tidx, qlens, tlens = self._pool
        b_pad = self._next_pow2(len(group))
        gi = np.asarray(group, dtype=np.int64)
        pad = b_pad - len(group)
        # padded rows point at pool row 0 with length 0 (same contract
        # as the old empty-pair padding)
        qi = np.concatenate([qidx[gi], np.zeros(pad, np.int32)])
        ti = np.concatenate([tidx[gi], np.zeros(pad, np.int32)])
        ql = np.concatenate([qlens[gi], np.zeros(pad, np.int32)])
        tl = np.concatenate([tlens[gi], np.zeros(pad, np.int32)])
        args = (
            pool_dev,
            jnp.asarray(qi),
            jnp.asarray(ti),
            jnp.asarray(ql),
            jnp.asarray(tl),
        )
        impl = self.impl
        if impl == "pallas":
            from .pallas_dense import K_MAX_C2

            if k > K_MAX_C2:  # band too wide for VMEM; rare escalations
                impl = "xla"
        return D_.dense_align_packed(
            *args, self.pen, k, l_pad, run_cap, impl
        )

    def _collect_group(
        self, pairs, group, device_buf, results, stats, k, run_cap, l_pad
    ) -> List[Tuple[int, Tuple[int, int]]]:
        """ONE device->host transfer; fills certified results and
        returns [(pair_idx, (next_k, next_cap)), ...] for escalations."""
        from ..utils.telemetry import timed_dispatch

        with timed_dispatch(len(group), len(group) * 2 * l_pad * k):
            packed = np.asarray(device_buf)
        meta = packed[:, :16].copy().view(np.int32).reshape(-1, 4)
        scores, nruns, cert, overflow = (meta[:, c] for c in range(4))
        ops = packed[:, 16 : 16 + run_cap]
        lens = packed[:, 16 + run_cap :]
        good = (cert == 1) & (overflow == 0)
        full_cap = 2 * l_pad + 8

        # vectorized PAF stats straight from the run buffers (the
        # per-record expanded-cigar reductions showed up at ~0.5 s per
        # 16k records in the pipeline profile)
        valid = np.arange(run_cap)[None, :] < nruns[:, None]
        l64 = lens.astype(np.int64)
        m_ct = np.where((ops == ord("M")) & valid, l64, 0).sum(1)
        x_ct = np.where((ops == ord("X")) & valid, l64, 0).sum(1)
        i_ct = np.where((ops == ord("I")) & valid, l64, 0).sum(1)
        d_ct = np.where((ops == ord("D")) & valid, l64, 0).sum(1)

        cigars = expand_runs_batch(ops, lens, nruns)
        escalate: List[Tuple[int, Tuple[int, int]]] = []
        for j, i in enumerate(group):
            if good[j]:
                results[i] = (int(scores[j]), cigars[j])
                stats[i, 0] = m_ct[j]
                stats[i, 1] = m_ct[j] + x_ct[j]
                stats[i, 2] = m_ct[j] + x_ct[j] + d_ct[j]  # query consumed
                stats[i, 3] = m_ct[j] + x_ct[j] + i_ct[j]  # target consumed
            elif cert[j] == 1:  # certified score, run buffer too small
                escalate.append((i, (k, full_cap)))
            else:
                kend_abs = abs(len(pairs[i][1]) - len(pairs[i][0]))
                if scores[j] < D_.INF:
                    nk = self._k_for_score(int(scores[j]), kend_abs)
                    nk = max(nk, 2 * k)  # always strictly widen
                else:
                    nk = 2 * k
                k_full = self._round_k(
                    len(pairs[i][0]) + len(pairs[i][1]) + 1
                )
                nk = min(nk, max(k_full, 2 * k))
                escalate.append((i, (nk, run_cap)))
        return escalate


class UnifiedAligner:
    """Length-routed dispatcher: one-shot dense engine for short pairs,
    segmented (checkpoint-replay) dense engine for long pairs — the
    latter replaces the wavefront engine's full-history pass, whose
    O(s^2) planes made 100 kb pairs a batch-of-one (the reference covers
    this regime with biWFA's O(s) memory, alignment.rs:265-287). The
    wavefront engine remains available via `wavefront` for score-only
    discovery workloads."""

    def __init__(
        self,
        pen: Penalties,
        dense_max_len: int = 16384,
        dense_config: Optional[DenseConfig] = None,
        wavefront_config: Optional[EngineConfig] = None,
        segmented_config=None,
    ):
        from .segmented import SegmentedDenseAligner

        self.pen = pen
        self.dense_max_len = dense_max_len
        self.dense = DenseBandAligner(pen, dense_config)
        self.segmented = SegmentedDenseAligner(pen, segmented_config)
        self.wavefront = BatchWavefrontAligner(pen, wavefront_config)

    def align_pairs(
        self,
        pairs: List[Tuple[bytes, bytes]],
        with_stats: bool = False,
        sigma_hint=None,
    ):
        n = len(pairs)
        results: List[Optional[Tuple[int, np.ndarray]]] = [None] * n
        stats = np.zeros((n, 4), dtype=np.int64)
        short_idx = [
            i
            for i, (q, t) in enumerate(pairs)
            if max(len(q), len(t)) <= self.dense_max_len
        ]
        long_idx = [
            i
            for i in range(n)
            if max(len(pairs[i][0]), len(pairs[i][1])) > self.dense_max_len
        ]
        if short_idx:
            # group by padded length to keep scan lengths tight
            by_pad: Dict[int, List[int]] = {}
            for i in short_idx:
                q, t = pairs[i]
                pad = DenseBandAligner._next_pow2(max(len(q), len(t), 4))
                by_pad.setdefault(pad, []).append(i)
            # coalesce tiny length-buckets into the next larger one: a
            # <256-pair bucket costs a full dispatch chain but only
            # ~2x the per-pair scan work when merged upward (the dense
            # engine re-derives l_pad from its own batch)
            if len(by_pad) > 1:
                for pad in sorted(by_pad):
                    if len(by_pad) == 1 or len(by_pad[pad]) >= 256:
                        continue
                    larger = [p for p in by_pad if p > pad]
                    if larger:
                        by_pad[min(larger)].extend(by_pad.pop(pad))
            for pad, idxs in sorted(by_pad.items()):
                sub = [pairs[i] for i in idxs]
                hint = (
                    [sigma_hint[i] for i in idxs]
                    if sigma_hint is not None
                    else None
                )
                out, st = self.dense.align_pairs(
                    sub, with_stats=True, sigma_hint=hint
                )
                for row, (i, r) in enumerate(zip(idxs, out)):
                    results[i] = r
                    stats[i] = st[row]
        if long_idx:
            from ..core.cigar import batch_cigar_stats

            sub = [pairs[i] for i in long_idx]
            hint = (
                [sigma_hint[i] for i in long_idx]
                if sigma_hint is not None
                else None
            )
            out = self.segmented.align_pairs(sub, sigma_hint=hint)
            st = batch_cigar_stats(
                [r[1] if r is not None else np.zeros(0, np.uint8) for r in out]
            )
            for row, (i, r) in enumerate(zip(long_idx, out)):
                results[i] = r
                stats[i] = st[row]
        return (results, stats) if with_stats else results
