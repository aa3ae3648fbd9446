"""Integration tests on seeded synthetic mutation data, mirroring the
reference's integration suite (reference: tests/integration_tests.rs —
microsatellites :49-83, CNVs :85-131, combined :133-176, 5%-divergence
:178-214, tandem repeats/homopolymers :674-753). The reference spawns
its CLI binary; we drive the library pipeline directly (the CLI surface
has its own suite in test_cli.py) and replay every CIGAR against the
inputs."""

import numpy as np
import pytest

from allwave_tpu.core.cigar import validate_cigar
from allwave_tpu.core.scores import parse_scores
from allwave_tpu.core.types import NoSparsification
from allwave_tpu.engine.pipeline import AllPairAligner
from allwave_tpu.testing.synth import (
    MutationConfig,
    make_test_case,
    mutate,
    random_dna,
)


def _align_all(seqs, scores="0,5,8,2,24,1"):
    aligner = AllPairAligner(
        seqs,
        parse_scores(scores),
        exclude_self=True,
        use_mash_orientation=True,
        sparsification=NoSparsification(),
    )
    out = []
    aligner.for_each_with_callback(out.append)
    return out


def _identity(r):
    return r.num_matches / r.alignment_length if r.alignment_length else 0.0


def _coverage(r, seqs):
    qlen = len(seqs[r.query_idx].seq)
    return r.query_end / qlen if qlen else 0.0


def _replay_all(results, seqs):
    from allwave_tpu.orient.orientation import reverse_complement

    for r in results:
        q = seqs[r.query_idx].seq
        if r.is_reverse:
            q = reverse_complement(q)
        validate_cigar(r.cigar_bytes, q, seqs[r.target_idx].seq)


@pytest.mark.slow
def test_microsatellite_mutations():
    """Reference: integration_tests.rs:49-83 — microsatellite
    expansion/contraction yields high-identity alignments with intact
    CIGAR replay."""
    case = make_test_case(
        seed=101,
        n_sequences=4,
        length=1000,
        cfg=MutationConfig(snp_rate=0.002, n_microsatellites=3),
    )
    out = _align_all(case.sequences)
    assert len(out) == 12
    _replay_all(out, case.sequences)
    for r in out:
        assert _identity(r) > 0.9
        assert _coverage(r, case.sequences) > 0.95


@pytest.mark.slow
def test_cnv_scale_indels_detected():
    """Reference: integration_tests.rs:85-131 — CNV-scale events show up
    as single long indel runs (the reference's CNV heuristic counts
    indels >= 1000 bp, validation.rs:254-284)."""
    rng = np.random.RandomState(202)
    # scaled down from the reference's >=1000 bp threshold to keep the
    # CPU suite fast; the >=1000 bp CNV heuristic itself is ported (and
    # unit-tested) in allwave_tpu.validation
    base = random_dna(rng, 2500)
    mutated, muts = mutate(
        rng,
        base,
        MutationConfig(
            snp_rate=0.002,
            n_cnvs=1,
            cnv_del_len=(500, 700),
        ),
    )
    from allwave_tpu.core.types import Sequence

    seqs = [Sequence("base", base), Sequence("mut", mutated)]
    out = _align_all(seqs)
    _replay_all(out, seqs)
    from allwave_tpu.core.cigar import run_length_encode

    found_long = False
    for r in out:
        ops, counts = run_length_encode(r.cigar_bytes)
        gap = (ops == ord("I")) | (ops == ord("D"))
        if np.any(gap & (counts >= 500)):
            found_long = True
    assert found_long, "CNV-scale indel not recovered as a long gap run"


@pytest.mark.slow
def test_combined_mutations_five_percent_divergence():
    """Reference: integration_tests.rs:133-214 — combined SNPs + indels
    at ~5% divergence stay well-aligned end to end."""
    div = 0.05
    case = make_test_case(
        seed=303,
        n_sequences=4,
        length=1000,
        cfg=MutationConfig(
            snp_rate=div, insertion_rate=div / 40, deletion_rate=div / 40
        ),
    )
    out = _align_all(case.sequences)
    _replay_all(out, case.sequences)
    for r in out:
        ident = _identity(r)
        assert 0.85 < ident <= 1.0, ident
        assert _coverage(r, case.sequences) > 0.95


@pytest.mark.slow
def test_tandem_repeats_and_homopolymers():
    """Reference: integration_tests.rs:674-753 — repetitive contexts
    (where indel placement is ambiguous) still produce optimal, fully
    consuming alignments."""
    rng = np.random.RandomState(404)
    parts = [
        random_dna(rng, 200),
        b"ACGT" * 60,  # tandem repeat
        b"A" * 80,  # homopolymer
        random_dna(rng, 200),
        b"GATTACA" * 20,
        random_dna(rng, 150),
    ]
    base = b"".join(parts)
    # expand the repeat and contract the homopolymer
    varied = (
        base[:200]
        + b"ACGT" * 66
        + b"A" * 60
        + base[520:]
    )
    from allwave_tpu.core.types import Sequence

    seqs = [Sequence("base", base), Sequence("var", varied)]
    out = _align_all(seqs)
    _replay_all(out, seqs)
    for r in out:
        assert _identity(r) > 0.95


@pytest.mark.slow
def test_identical_sequences_are_perfect():
    """Reference: integration_tests.rs:216-260 — identical sequences
    give exactly 100% identity, full coverage, zero X/I/D ops."""
    rng = np.random.RandomState(505)
    s = random_dna(rng, 1500)
    from allwave_tpu.core.types import Sequence

    seqs = [Sequence("a", s), Sequence("b", s)]
    out = _align_all(seqs)
    for r in out:
        assert _identity(r) == 1.0
        assert r.query_end == 1500 and r.target_end == 1500
        assert np.all(r.cigar_bytes == ord("M"))
