"""Native C++ components vs the Python oracles (bit/byte equality)."""

import numpy as np
import pytest

from allwave_tpu import native
from allwave_tpu.core.scores import parse_scores
from allwave_tpu.hashing.siphash import hash_kmers, siphash13
from allwave_tpu.wfa.params import resolve_penalties
from allwave_tpu.wfa.reference_impl import wfa_align

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_siphash_raw_matches():
    lib = native.get_lib()
    for msg in [b"", b"x", b"hello world", bytes(range(100))]:
        assert lib.siphash13_raw(msg, len(msg)) == siphash13(msg)


def test_kmer_hashes_match():
    rng = np.random.RandomState(0)
    seq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=500)
    for k in (3, 15, 16, 31):
        expected = hash_kmers(seq, k)
        got = native.hash_kmers_native(seq, k)
        assert np.array_equal(got, expected), k


def test_wfa_matches_python_oracle():
    rng = np.random.RandomState(1)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for pen_str in ("0,1,1,1", "0,5,8,2", "0,5,8,2,24,1"):
        pen = resolve_penalties(parse_scores(pen_str))
        for seed in range(6):
            r = np.random.RandomState(seed)
            q = r.choice(bases, size=r.randint(5, 150)).tobytes()
            t = bytearray(q)
            for _ in range(r.randint(0, 6)):
                i = r.randint(0, len(t))
                t[i] = bases[r.randint(0, 4)]
            if r.randint(0, 2):
                i = r.randint(0, len(t))
                t[i:i] = r.choice(bases, size=r.randint(1, 8)).tobytes()
            t = bytes(t)
            py_score, py_cigar = wfa_align(q, t, pen)
            nat_score, nat_cigar = native.wfa_align_native(q, t, pen)
            assert nat_score == py_score, (pen_str, seed)
            assert nat_cigar.tobytes() == py_cigar.tobytes(), (pen_str, seed)


def test_wfa_native_empty():
    pen = resolve_penalties(parse_scores("0,5,8,2"))
    score, cigar = native.wfa_align_native(b"", b"ACG", pen)
    assert score == pen.o1 + 3 * pen.e1
    assert cigar.tobytes() == b"III"
