#!/usr/bin/env python
"""Precompile the common kernel shapes into the persistent cache.

Remote TPU compiles through a driver tunnel take 10s of seconds to
minutes each; the persistent compilation cache (utils/jaxcache.py)
makes them one-time, and this script front-loads that cost so the first
real run of a fresh process is fast.

Shapes warmed: the fused dense align at the K-ladder widths the
mash-hint router actually picks, across the batch/length buckets the
engine produces. Tune with WARMUP_LENGTHS / WARMUP_KS env vars
(comma-separated).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    from allwave_tpu.core.scores import parse_scores
    from allwave_tpu.testing.synth import MutationConfig, make_test_case
    from allwave_tpu.wfa.dense_engine import DenseBandAligner, DenseConfig
    from allwave_tpu.wfa.params import resolve_penalties

    lengths = [
        int(v)
        for v in os.environ.get("WARMUP_LENGTHS", "1000,4000,15000").split(",")
    ]
    ks = [
        int(v) for v in os.environ.get("WARMUP_KS", "128,256,384,512").split(",")
    ]
    pen = resolve_penalties(parse_scores(os.environ.get("WARMUP_SCORES", "0,5,8,2,24,1")))

    total0 = time.time()
    for length in lengths:
        case = make_test_case(
            seed=7,
            n_sequences=4,
            length=length,
            cfg=MutationConfig(snp_rate=0.02),
        )
        seqs = [s.seq for s in case.sequences]
        pairs = [(seqs[0], seqs[1]), (seqs[2], seqs[3])]
        for k in ks:
            al = DenseBandAligner(pen, DenseConfig(k_initial=k))
            t0 = time.time()
            al.align_pairs(pairs)
            print(
                f"warmed L~{length} K={k}: {time.time() - t0:.1f}s",
                file=sys.stderr,
            )
    # long-pair shapes (bench configs 5/5b): run miniature versions of
    # the EXACT bench workloads (same seeds/sizes -> same kernel
    # shapes: wf sweep + narrow replay + traceback at the hint-derived
    # K rungs, and the dense segmented 100 kb path). WARMUP_LONG=0
    # skips.
    if os.environ.get("WARMUP_LONG", "1") != "0":
        from allwave_tpu.core.types import NoSparsification
        from allwave_tpu.engine.pipeline import AllPairAligner

        for name, seed, cfg in (
            (
                "5b",
                18,
                MutationConfig(
                    snp_rate=0.0025,
                    insertion_rate=0.0001,
                    deletion_rate=0.0001,
                ),
            ),
            (
                "5",
                17,
                MutationConfig(
                    snp_rate=0.02,
                    insertion_rate=0.0005,
                    deletion_rate=0.0005,
                ),
            ),
        ):
            n = 8 if name == "5b" else 4
            case = make_test_case(
                seed=seed, n_sequences=n, length=100_000, cfg=cfg
            )
            t0 = time.time()
            al = AllPairAligner(
                case.sequences,
                parse_scores("0,5,8,2,24,1"),
                exclude_self=True,
                use_mash_orientation=True,
                sparsification=NoSparsification(),
            )
            out = []
            al.for_each_with_callback(out.append)
            print(
                f"warmed config {name} (100 kb x{n}): {time.time()-t0:.1f}s",
                file=sys.stderr,
            )

    print(f"warmup done in {time.time() - total0:.0f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
