"""Mesh / multi-device tests on the 8-virtual-device CPU backend
(conftest sets xla_force_host_platform_device_count=8)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from allwave_tpu.core.scores import parse_scores
from allwave_tpu.wfa import dense as D_
from allwave_tpu.wfa.params import resolve_penalties
from allwave_tpu.parallel.mesh import (
    make_mesh,
    sharded_dense_step,
)


def _pool_batch(rng, n_seqs, L, l_pad, n_pairs):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    pool = np.zeros((n_seqs, l_pad), np.uint8)
    lens = np.zeros(n_seqs, np.int32)
    for i in range(n_seqs):
        s = rng.choice(bases, L)
        if i:
            mut = rng.rand(L) < 0.05
            s = pool[0, :L].copy()
            s[mut] = rng.choice(bases, mut.sum())
        pool[i, :L] = s
        lens[i] = L
    qidx = rng.randint(0, n_seqs, n_pairs).astype(np.int32)
    tidx = rng.randint(0, n_seqs, n_pairs).astype(np.int32)
    return pool, qidx, tidx, lens[qidx], lens[tidx]


def test_sharded_dense_step_matches_single_device():
    pen = resolve_penalties(parse_scores("0,5,8,2,24,1"))
    rng = np.random.RandomState(3)
    l_pad, K, run_cap = 128, 128, 64
    pool, qidx, tidx, qlens, tlens = _pool_batch(rng, 6, 100, l_pad, 16)

    mesh = make_mesh(8, diag=1)
    step = sharded_dense_step(mesh, pen, K, l_pad, run_cap, impl="xla")
    with mesh:
        sharded = np.asarray(
            step(
                jnp.asarray(pool),
                jnp.asarray(qidx),
                jnp.asarray(tidx),
                jnp.asarray(qlens),
                jnp.asarray(tlens),
            )
        )
    single = np.asarray(
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
    np.testing.assert_array_equal(sharded, single)


def test_shard_pairs_partition_is_exact():
    from allwave_tpu.parallel.dist import merge_paf_shards, shard_pairs

    pairs = np.arange(46).reshape(23, 2)
    shards = [shard_pairs(pairs, p, 4) for p in range(4)]
    got = np.concatenate(shards, axis=0)
    assert sorted(map(tuple, got.tolist())) == sorted(
        map(tuple, pairs.tolist())
    )


def test_distributed_aligner_single_process_covers_all(tmp_path):
    from allwave_tpu.core.types import NoSparsification, Sequence
    from allwave_tpu.parallel.dist import (
        DistributedAllPairAligner,
        merge_paf_shards,
    )

    rng = np.random.RandomState(4)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seqs = []
    for i in range(5):
        s = rng.choice(bases, 120)
        seqs.append(Sequence(f"s{i}", s.tobytes()))
    al = DistributedAllPairAligner(
        seqs,
        parse_scores("0,5,8,2,24,1"),
        sparsification=NoSparsification(),
    )
    assert al.pair_count() == 20  # single process owns everything
    prefix = str(tmp_path / "out")
    path = al.run_to_paf_shard(prefix)
    merged = str(tmp_path / "merged.paf")
    merge_paf_shards(prefix, 1, merged)
    lines = open(merged).read().strip().splitlines()
    assert len(lines) == 20


def test_production_pipeline_uses_local_mesh_byte_identical(monkeypatch):
    """VERDICT r1 item 2: with >1 local device the production pipeline
    fans dispatch groups over a local ("data",) mesh via
    sharded_dense_step; PAF output must be byte-identical to the
    single-device path."""
    import jax

    from allwave_tpu.core.paf import alignment_to_paf
    from allwave_tpu.core.scores import parse_scores
    from allwave_tpu.core.types import NoSparsification
    from allwave_tpu.engine.pipeline import AllPairAligner
    from allwave_tpu.testing.synth import MutationConfig, make_test_case

    assert jax.local_device_count() >= 8  # conftest: 8 virtual devices
    cfg = MutationConfig(snp_rate=0.05, insertion_rate=0.002, deletion_rate=0.002)
    case = make_test_case(seed=77, n_sequences=7, length=150, cfg=cfg)
    params = parse_scores("0,5,8,2,24,1")

    def run():
        al = AllPairAligner(
            case.sequences,
            params,
            exclude_self=True,
            use_mash_orientation=True,
            sparsification=NoSparsification(),
        )
        out = []
        al.for_each_with_callback(out.append)
        return sorted(alignment_to_paf(r, case.sequences) for r in out)

    from allwave_tpu.wfa import dense_engine as DE

    calls = {"mesh": 0}
    orig = DE.DenseBandAligner._sharded_fn

    def counting(self, *a, **k):
        calls["mesh"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(DE.DenseBandAligner, "_sharded_fn", counting)
    meshed = run()
    assert calls["mesh"] > 0, "mesh path not exercised"

    monkeypatch.setenv("ALLWAVE_SINGLE_DEVICE", "1")
    single = run()
    assert meshed == single
