"""Training-data export operators (operators/export.py): deterministic
sharding and GPT concat-then-chunk sequence-packing geometry."""

from __future__ import annotations

import hashlib
import math
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from research_engine_spark.operators.export import (
    assign_shards,
    pack_sequences,
    write_shards,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(i % 7)))
            for i in range(200)]  # token counts 0..6, incl. empty docs
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_shard(doc_id: int, n: int, seed: int = 0) -> int:
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
    return int(h[:4], 16) % n


def test_assign_shards_matches_reference_formula(docs):
    got = {r.doc_id: r.shard
           for r in assign_shards(docs, 8).collect()}
    assert got == {i: _py_shard(i, 8) for i in range(200)}
    assert set(got.values()) == set(range(8))  # statistically full


def test_assign_shards_partitioning_invariant(docs):
    a = {(r.doc_id, r.shard) for r in assign_shards(docs, 5).collect()}
    b = {(r.doc_id, r.shard)
         for r in assign_shards(docs.repartition(13), 5).collect()}
    assert a == b
    # a different seed is an independent shuffle, not a rotation
    c = {r.doc_id: r.shard
         for r in assign_shards(docs, 5, seed=1).collect()}
    moved = sum(1 for (d, s) in a if c[d] != s)
    assert moved > 50


def test_write_shards_roundtrip(spark, docs):
    out = tempfile.mkdtemp(prefix="shards_")
    try:
        write_shards(docs, out, n_shards=4)
        back = spark.read.parquet(out)
        assert back.count() == 200
        got = {r.doc_id: int(r.shard) for r in back.collect()}
        assert got == {i: _py_shard(i, 4) for i in range(200)}
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_pack_sequences_geometry(docs):
    L = 10
    out = {r.doc_id: r for r in pack_sequences(docs, L).collect()}
    # python reference: concat in doc_id order
    start = 0
    for i in range(200):
        n = i % 7
        r = out[i]
        assert (r.n_tokens, r.start_token) == (n, start)
        assert r.first_seq == start // L
        assert r.last_seq == (start + max(n, 1) - 1) // L
        assert r.n_seqs == ((start + n - 1) // L - start // L + 1
                            if n else 0)
        start += n
    # total sequences from the stream length
    total = sum(i % 7 for i in range(200))
    assert max(r.last_seq for r in out.values()) == (total - 1) // L


def test_pack_sequences_partitioning_invariant(docs):
    a = {(r.doc_id, r.start_token, r.first_seq, r.last_seq)
         for r in pack_sequences(docs, 7).collect()}
    b = {(r.doc_id, r.start_token, r.first_seq, r.last_seq)
         for r in pack_sequences(docs.repartition(17), 7,
                                 n_partitions=3).collect()}
    assert a == b


def test_export_arg_validation(docs):
    with pytest.raises(ValueError):
        assign_shards(docs, 0)
    with pytest.raises(ValueError):
        assign_shards(docs, 100_000)
    with pytest.raises(ValueError):
        pack_sequences(docs, 0)
