"""Host orchestration for the dense banded engine + the unified
length-routed aligner.

DenseBandAligner: escalates the band width K (doubling) until every
pair's banded result carries the optimality certificate, then traces
back on device from the choice planes.

UnifiedAligner: routes short pairs to the dense engine (L*K work, zero
gathers, single scan) and long pairs to the wavefront engine (s*K work).
Both produce identical scores; CIGARs follow each engine's documented
tie-break (cross-checked in tests).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from .params import Penalties
from . import dense as D_
from .batch import expand_runs_to_cigar
from .engine import BatchWavefrontAligner, EngineConfig


@dataclass
class DenseConfig:
    k_initial: int = 64
    k_max: int = 1 << 14
    #: memory budget for the (2L, B, K) choice planes of one batch
    choices_budget_bytes: int = 2 << 30
    max_batch: int = 1024


class DenseBandAligner:
    def __init__(self, pen: Penalties, config: Optional[DenseConfig] = None):
        from ..utils.jaxcache import enable_compilation_cache

        enable_compilation_cache()
        self.pen = pen
        self.config = config or DenseConfig()

    @staticmethod
    def _next_pow2(n: int) -> int:
        return 1 << max(n - 1, 1).bit_length() if n > 2 else max(n, 1)

    def _batch_size(self, l_pad: int, k: int) -> int:
        per_pair = 2 * l_pad * k  # uint8 choice planes
        b = self.config.choices_budget_bytes // max(per_pair, 1)
        return int(max(1, min(b, self.config.max_batch)))

    def align_pairs(
        self, pairs: List[Tuple[bytes, bytes]]
    ) -> List[Optional[Tuple[int, np.ndarray]]]:
        import jax.numpy as jnp

        n = len(pairs)
        results: List[Optional[Tuple[int, np.ndarray]]] = [None] * n
        if n == 0:
            return results

        max_len = max(max(len(q), len(t)) for q, t in pairs)
        l_pad = self._next_pow2(max(max_len, 4))
        max_kend = max(abs(len(t) - len(q)) for q, t in pairs)

        pending = list(range(n))
        k = max(self.config.k_initial, self._next_pow2(max_kend + 2))
        while pending and k <= self.config.k_max:
            bsz = self._batch_size(l_pad, k)
            still: List[int] = []
            for lo in range(0, len(pending), bsz):
                group = pending[lo : lo + bsz]
                still.extend(self._run_group(pairs, group, results, k, l_pad))
            pending = still
            k *= 2
        # anything left failed band escalation
        return results

    def _run_group(self, pairs, group, results, k, l_pad) -> List[int]:
        """Aligns pairs[group]; fills results for certified pairs, returns
        the indices needing a wider band."""
        import jax.numpy as jnp

        b_pad = self._next_pow2(len(group))
        sub = [pairs[i] for i in group] + [(b"", b"")] * (b_pad - len(group))
        qlens = np.array([len(q) for q, _ in sub], dtype=np.int32)
        tlens = np.array([len(t) for _, t in sub], dtype=np.int32)
        qs = np.zeros((b_pad, l_pad), dtype=np.uint8)
        ts = np.zeros((b_pad, l_pad), dtype=np.uint8)
        for r, (q, t) in enumerate(sub):
            qs[r, : len(q)] = np.frombuffer(q, dtype=np.uint8)
            ts[r, : len(t)] = np.frombuffer(t, dtype=np.uint8)

        scores, cert, choices = D_.dense_forward(
            jnp.asarray(qs),
            jnp.asarray(ts),
            jnp.asarray(qlens),
            jnp.asarray(tlens),
            self.pen,
            k,
            l_pad,
            True,
        )
        run_cap = 2 * l_pad + 8
        ops, lens, nruns, overflow = D_.dense_traceback(
            choices,
            scores,
            jnp.asarray(qlens),
            jnp.asarray(tlens),
            self.pen,
            run_cap,
        )
        scores = np.asarray(scores)
        cert = np.asarray(cert)
        ops = np.asarray(ops)
        lens = np.asarray(lens)
        nruns = np.asarray(nruns)
        overflow = np.asarray(overflow)

        escalate: List[int] = []
        for j, i in enumerate(group):
            if not cert[j]:
                escalate.append(i)
                continue
            if overflow[j]:
                escalate.append(i)
                continue
            cigar = expand_runs_to_cigar(ops[j], lens[j], int(nruns[j]))
            results[i] = (int(scores[j]), cigar)
        return escalate


class UnifiedAligner:
    """Length-routed dispatcher: dense engine for short pairs, wavefront
    engine for long pairs. Same align_pairs contract as both."""

    def __init__(
        self,
        pen: Penalties,
        dense_max_len: int = 4096,
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
        long_idx = [i for i in range(n) if max(len(pairs[i][0]), len(pairs[i][1])) > self.dense_max_len]
        if short_idx:
            # group by padded length to keep scan lengths tight
            by_pad: dict = {}
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
