"""Host orchestration for the dense banded engine + the unified
length-routed aligner.

DenseBandAligner runs two phases:
  1. PROBE: score-only sweeps (no choice planes) with K doubling until
     every pair's banded score carries the optimality certificate —
     cheap, so escalation waste is small;
  2. TRACE: pairs grouped by certified K; one choices+traceback run per
     group; run buffers are compacted (uint8 lens, sliced to the longest
     actual run count) before leaving the device — transfers over the
     TPU tunnel are expensive.

UnifiedAligner routes short pairs to the dense engine (L*K work, zero
gathers, single scan) and long pairs to the wavefront engine (s*K work).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from .params import Penalties
from . import dense as D_
from .batch import expand_runs_to_cigar
from .engine import BatchWavefrontAligner, EngineConfig


@dataclass
class DenseConfig:
    k_initial: int = 64
    k_max: int = 1 << 14
    #: memory budget for the (2L, B, K) choice+runlen planes of one batch
    choices_budget_bytes: int = 4 << 30
    #: lane budget (B*K) for score-only probe sweeps
    probe_lane_budget: int = 1 << 21
    max_batch: int = 2048


class DenseBandAligner:
    def __init__(self, pen: Penalties, config: Optional[DenseConfig] = None):
        from ..utils.jaxcache import enable_compilation_cache

        enable_compilation_cache()
        self.pen = pen
        self.config = config or DenseConfig()

    @staticmethod
    def _next_pow2(n: int) -> int:
        return 1 << max(n - 1, 1).bit_length() if n > 2 else max(n, 1)

    def _k_for_score(self, sigma: int, kend_abs: int) -> int:
        """Smallest pow2 band width whose exit-and-return certificate
        holds for a banded score sigma: 2*o_min + 2*(W+1)*e_min > sigma."""
        o_min = min(self.pen.o1, self.pen.o2) if self.pen.two_piece else self.pen.o1
        e_min = min(self.pen.e1, self.pen.e2) if self.pen.two_piece else self.pen.e1
        w = (sigma - 2 * o_min) // (2 * e_min) + 1
        k = kend_abs + 2 * max(w, 0) + 3
        return min(self._next_pow2(max(k, self.config.k_initial)), self.config.k_max)

    def _prepare(self, sub: List[Tuple[bytes, bytes]], l_pad: int):
        import jax.numpy as jnp

        qlens = np.array([len(q) for q, _ in sub], dtype=np.int32)
        tlens = np.array([len(t) for _, t in sub], dtype=np.int32)
        qs = np.zeros((len(sub), l_pad), dtype=np.uint8)
        ts = np.zeros((len(sub), l_pad), dtype=np.uint8)
        for r, (q, t) in enumerate(sub):
            qs[r, : len(q)] = np.frombuffer(q, dtype=np.uint8)
            ts[r, : len(t)] = np.frombuffer(t, dtype=np.uint8)
        return (
            jnp.asarray(qs),
            jnp.asarray(ts),
            jnp.asarray(qlens),
            jnp.asarray(tlens),
        )

    def align_pairs(
        self, pairs: List[Tuple[bytes, bytes]]
    ) -> List[Optional[Tuple[int, np.ndarray]]]:
        n = len(pairs)
        results: List[Optional[Tuple[int, np.ndarray]]] = [None] * n
        if n == 0:
            return results

        max_len = max(max(len(q), len(t)) for q, t in pairs)
        l_pad = self._next_pow2(max(max_len, 4))
        max_kend = max(abs(len(t) - len(q)) for q, t in pairs)

        # phase 1: ONE cheap probe at K0 reads each pair's banded score;
        # from it the exact band needed for the optimality certificate is
        # computed directly (banded score >= true score, so the jump is
        # conservative). Pairs whose end cell was unreachable at K0 fall
        # back to doubling.
        cert_k: Dict[int, int] = {}
        pending = list(range(n))
        k = max(self.config.k_initial, self._next_pow2(max_kend + 2))
        first_probe = True
        while pending and k <= self.config.k_max:
            chunk = max(1, min(self.config.probe_lane_budget // k, self.config.max_batch))
            still: List[int] = []
            for lo in range(0, len(pending), chunk):
                group = pending[lo : lo + chunk]
                b_pad = self._next_pow2(len(group))
                sub = [pairs[i] for i in group] + [(b"", b"")] * (b_pad - len(group))
                args = self._prepare(sub, l_pad)
                scores, cert, _ = D_.dense_forward(*args, self.pen, k, l_pad, False)
                cert = np.asarray(cert)
                scores = np.asarray(scores)
                for j, i in enumerate(group):
                    if cert[j]:
                        cert_k[i] = k
                    elif first_probe and scores[j] < D_.INF:
                        cert_k[i] = self._k_for_score(
                            int(scores[j]), abs(len(pairs[i][1]) - len(pairs[i][0]))
                        )
                    else:
                        still.append(i)
            pending = still
            k *= 2
            first_probe = False

        # phase 2: choices + traceback per certified-K group
        by_k: Dict[int, List[int]] = {}
        for i, kk in cert_k.items():
            by_k.setdefault(kk, []).append(i)
        for kk, idxs in sorted(by_k.items()):
            per_pair = 2 * (2 * l_pad * kk)  # choices + runlen uint8 planes
            bsz = int(
                max(1, min(self.config.choices_budget_bytes // per_pair, self.config.max_batch))
            )
            idxs = sorted(idxs, key=lambda i: len(pairs[i][0]) + len(pairs[i][1]))
            for lo in range(0, len(idxs), bsz):
                group = idxs[lo : lo + bsz]
                self._trace_group(pairs, group, results, kk, l_pad)
        return results

    def _trace_group(self, pairs, group, results, k, l_pad) -> None:
        b_pad = self._next_pow2(len(group))
        sub = [pairs[i] for i in group] + [(b"", b"")] * (b_pad - len(group))
        args = self._prepare(sub, l_pad)
        scores, cert, choices = D_.dense_forward(*args, self.pen, k, l_pad, True)
        run_cap = 2 * l_pad + 8
        ops, lens, nruns, overflow = D_.dense_traceback(
            choices, scores, args[2], args[3], self.pen, run_cap
        )
        nruns = np.asarray(nruns)
        overflow = np.asarray(overflow) | ~np.asarray(cert)
        scores = np.asarray(scores)
        m = int(nruns.max()) if nruns.size else 0
        # compact transfer: only the used prefix of the run buffers
        ops = np.asarray(ops[:, :m]) if m else np.zeros((len(sub), 0), np.uint8)
        lens = np.asarray(lens[:, :m]) if m else np.zeros((len(sub), 0), np.uint8)
        for j, i in enumerate(group):
            if overflow[j]:
                results[i] = None
                continue
            cigar = expand_runs_to_cigar(
                ops[j], lens[j].astype(np.int64), int(nruns[j])
            )
            results[i] = (int(scores[j]), cigar)


class UnifiedAligner:
    """Length-routed dispatcher: dense engine for short pairs, wavefront
    engine for long pairs. Same align_pairs contract as both."""

    def __init__(
        self,
        pen: Penalties,
        dense_max_len: int = 16384,
        dense_config: Optional[DenseConfig] = None,
        wavefront_config: Optional[EngineConfig] = None,
    ):
        self.pen = pen
        self.dense_max_len = dense_max_len
        self.dense = DenseBandAligner(pen, dense_config)
        self.wavefront = BatchWavefrontAligner(pen, wavefront_config)

    def align_pairs(
        self, pairs: List[Tuple[bytes, bytes]]
    ) -> List[Optional[Tuple[int, np.ndarray]]]:
        n = len(pairs)
        results: List[Optional[Tuple[int, np.ndarray]]] = [None] * n
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
            for pad, idxs in sorted(by_pad.items()):
                sub = [pairs[i] for i in idxs]
                out = self.dense.align_pairs(sub)
                for i, r in zip(idxs, out):
                    results[i] = r
        if long_idx:
            sub = [pairs[i] for i in long_idx]
            out = self.wavefront.align_pairs(sub)
            for i, r in zip(long_idx, out):
                results[i] = r
        return results
