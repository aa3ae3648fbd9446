"""Benchmark driver — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: BASELINE.json config-2 style — all-pairs directed alignment of
mutated haplotypes (two-piece-affine default scores 0,5,8,2,24,1, mash
orientation), measured end-to-end (orientation + batched device alignment
+ CIGAR materialization), excluding one warmup chunk that absorbs jit
compilation.

Baseline: the reference publishes no numbers (BASELINE.md), and the
reference binary cannot be built here (no Rust toolchain), so the
baseline is the single-core throughput of this repo's own native C++
wavefront aligner (csrc/wfa_oracle.cpp) on the same pairs — an honest
stand-in for allwave's per-core CPU speed (same algorithm family, same
exactness; allwave scales roughly linearly with -t threads on top).
vs_baseline = device alignments/s / (C++ single-core alignments/s).

Env knobs:
  BENCH_N_SEQS (default 128), BENCH_LEN (default 1000),
  BENCH_DIVERGENCE (default 0.02), ALLWAVE_PLATFORM (force backend).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    n_seqs = int(os.environ.get("BENCH_N_SEQS", "128"))
    length = int(os.environ.get("BENCH_LEN", "1000"))
    div = float(os.environ.get("BENCH_DIVERGENCE", "0.02"))

    from allwave_tpu.core.scores import parse_scores
    from allwave_tpu.testing.synth import MutationConfig, make_test_case
    from allwave_tpu.wfa.params import resolve_penalties
    from allwave_tpu import native

    pen = resolve_penalties(parse_scores("0,5,8,2,24,1"))
    cfg = MutationConfig(
        snp_rate=div, insertion_rate=div / 40, deletion_rate=div / 40
    )
    case = make_test_case(seed=1234, n_sequences=n_seqs, length=length, cfg=cfg)
    seqs = case.sequences

    # END-TO-END: the full pipeline the CLI runs — mash orientation +
    # batched device alignment + CIGAR materialization (reference flow:
    # main.rs:370 -> alignment.rs:25-66)
    from allwave_tpu.core.types import NoSparsification
    from allwave_tpu.engine.pipeline import AllPairAligner
    from allwave_tpu.core.scores import parse_scores as _ps

    def run_once():
        aligner = AllPairAligner(
            seqs,
            _ps("0,5,8,2,24,1"),
            exclude_self=True,
            use_mash_orientation=True,
            sparsification=NoSparsification(),
        )
        out = []
        aligner.for_each_with_callback(out.append)
        return out

    # full-shape warmup absorbs jit compilation (the driver wants
    # steady-state throughput; first-compile cost is reported separately)
    t0 = time.time()
    warm = run_once()
    compile_and_first_run_s = time.time() - t0
    assert all(r.score < 2**31 - 1 for r in warm)
    pairs = [
        (seqs[i].seq, seqs[j].seq)
        for i in range(n_seqs)
        for j in range(n_seqs)
        if i != j
    ]
    assert len(warm) == len(pairs)

    # two measured runs, best-of (the driver tunnel adds multi-second
    # jitter; the kernel itself is deterministic)
    best_dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        results = run_once()
        best_dt = min(best_dt, time.time() - t0)
    dt = best_dt
    n_ok = sum(1 for r in results if r.alignment_length > 0)
    device_rate = n_ok / dt

    # wavefront cells/s: sum over pairs of s*^2 (the exact DP cell count
    # of the full band) / wall time — the survey's second north-star metric
    cells = sum((r.score + 1) * (2 * r.score + 1) for r in results)
    cells_per_sec = cells / dt

    # CPU baseline: native single-core on a sample. A single 32-pair pass
    # is ~10 ms of work — far too short to time stably — so warm up once,
    # then repeat the sample loop until >=1 s has elapsed and average.
    sample = pairs[: min(32, len(pairs))]
    for q, t in sample[:4]:
        native.wfa_align_native(q, t, pen)
    cpu_n = 0
    t0 = time.perf_counter()
    while True:
        for q, t in sample:
            native.wfa_align_native(q, t, pen)
        cpu_n += len(sample)
        cpu_dt = time.perf_counter() - t0
        if cpu_dt >= 1.0:
            break
    cpu_rate = cpu_n / cpu_dt if cpu_dt > 0 else float("nan")

    import jax

    platform = jax.devices()[0].platform
    print(
        json.dumps(
            {
                "metric": f"alignments_per_sec[{platform},n={n_seqs}x{length}bp,div={div}]",
                "value": round(device_rate, 2),
                "unit": "alignments/s",
                "vs_baseline": round(device_rate / cpu_rate, 3),
                "extra": {
                    "wavefront_cells_per_sec": round(cells_per_sec),
                    "cpu_single_core_alignments_per_sec": round(cpu_rate, 2),
                    "pairs": len(pairs),
                    "wall_s": round(dt, 2),
                    "first_run_incl_compile_s": round(compile_and_first_run_s, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
