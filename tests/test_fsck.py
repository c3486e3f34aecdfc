"""verify_index (operators/fsck.py): green through the whole index
lifecycle, red on planted corruption."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from research_engine_spark.corpus import synth_transcripts
from research_engine_spark.operators.deletes import delete_ids
from research_engine_spark.operators.fsck import verify_index
from research_engine_spark.operators.generations import resolve
from research_engine_spark.operators.indexer import (
    append_segment,
    build_index,
    compact_index,
)
from research_engine_spark.operators.scorer import IndexReader, search


@pytest.fixture(scope="module")
def fsck_index(spark):
    tx = synth_transcripts(spark, n_convs=24, seed=55)
    d = tempfile.mkdtemp(prefix="fsck_idx_")
    build_index(tx.filter("conv_id < 'conv_00000012'"), d, n_buckets=2)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_green_through_lifecycle(spark, fsck_index):
    d = fsck_index
    assert verify_index(spark, d, deep=True)["ok"]
    extra = synth_transcripts(spark, n_convs=24, seed=55).filter(
        "conv_id >= 'conv_00000012'")
    append_segment(extra, d)
    assert verify_index(spark, d, deep=True)["ok"]
    r = IndexReader(spark, d)
    victim = search(r, "neural", k=1, with_text=False).collect()[0].doc_id
    delete_ids(d, [int(victim)])
    assert verify_index(spark, d, deep=True)["ok"]
    compact_index(spark, d)  # purge -> generation 1
    res = verify_index(spark, d, deep=True)
    assert res["ok"], res


def test_red_on_corruption(spark, fsck_index, tmp_path):
    # work on a copy: tamper with corpus_stats
    d = str(tmp_path / "corrupt")
    shutil.copytree(fsck_index, d)
    p = resolve(d, "corpus_stats.json")
    with open(p) as f:
        stats = json.load(f)
    stats["n_docs"] += 7
    with open(p, "w") as f:
        json.dump(stats, f)
    res = verify_index(spark, d)
    assert not res["ok"]
    assert not res["checks"]["n_docs"]["ok"]


def test_red_when_both_sum_sides_unreadable(spark, fsck_index, tmp_path):
    # lineage AND postings parquet garbage: both footer sums come back
    # None — that must be a lineage_coverage FAILURE, not None==None
    d = str(tmp_path / "bothbad")
    shutil.copytree(fsck_index, d)
    for tbl in ("lineage", "postings"):
        root = resolve(d, tbl)
        for dirpath, _, files in os.walk(root):
            for fn in files:
                if fn.endswith(".parquet"):
                    with open(os.path.join(dirpath, fn), "wb") as f:
                        f.write(b"not parquet")
    res = verify_index(spark, d)
    assert not res["ok"]
    assert not res["checks"]["lineage_coverage"]["ok"]


def test_red_on_missing_generation_dir(spark, fsck_index, tmp_path):
    d = str(tmp_path / "missing")
    shutil.copytree(fsck_index, d)
    shutil.rmtree(resolve(d, "lineage"))
    res = verify_index(spark, d)
    assert not res["ok"]
    assert resolve(d, "lineage").split(os.sep)[-1] in \
        res["checks"]["generation_pointer"]["missing"]


def test_red_on_tampered_payload(spark, fsck_index, tmp_path):
    """Bit-rot detection (payload checksums): flip one byte inside one
    block's compressed doc_gaps payload — footer metadata, row counts,
    and block layout all stay valid, so ONLY the checksum recompute can
    catch it. Deep fsck must go red on payload_checksums; fast tier
    (which never reads payloads, by design) stays green."""
    import pyarrow.parquet as pq

    d = str(tmp_path / "bitrot")
    shutil.copytree(fsck_index, d)
    root = resolve(d, "postings")
    victim = None
    for dirpath, _, files in os.walk(root):
        for fn in sorted(files):
            if fn.endswith(".parquet"):
                victim = os.path.join(dirpath, fn)
                break
        if victim:
            break
    tbl = pq.read_table(victim)
    assert "payload_xxh" in tbl.column_names
    gaps = tbl.column("doc_gaps").to_pylist()
    i = next(j for j, g in enumerate(gaps) if g)
    flipped = bytes([gaps[i][0] ^ 0x01]) + gaps[i][1:]
    gaps[i] = flipped
    import pyarrow as pa

    cols = {c: (pa.array(gaps, type=pa.binary()) if c == "doc_gaps"
                else tbl.column(c)) for c in tbl.column_names}
    pq.write_table(pa.table(cols, schema=tbl.schema), victim)
    # drop Hadoop's local-FS .crc sidecar for the rewritten file: on the
    # object stores a 100 TB deployment reads from there IS no sidecar —
    # the engine-level payload checksum is the portable detector this
    # test exercises
    crc = os.path.join(os.path.dirname(victim),
                       f".{os.path.basename(victim)}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    fast = verify_index(spark, d)
    assert fast["ok"], fast  # fast tier is payload-blind by design
    res = verify_index(spark, d, deep=True)
    assert not res["ok"]
    assert not res["checks"]["payload_checksums"]["ok"]
    assert res["checks"]["payload_checksums"]["bad_blocks"] >= 1
    # every other deep invariant still green (the tamper is surgical)
    assert res["checks"]["block_layout"]["ok"]
