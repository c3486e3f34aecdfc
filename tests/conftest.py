"""Shared fixtures: one SparkSession, one synthetic corpus, one built index
per test session (index builds are the slow part — build once, query many).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from research_engine_spark.corpus import synth_transcripts, transcripts_pandas
from research_engine_spark.operators.indexer import build_index
from research_engine_spark.operators.scorer import IndexReader
from research_engine_spark.oracle import BM25Oracle
from research_engine_spark.session import get_spark

N_CONVS = 80
SEED = 42

from research_engine_spark.reference_queries import (  # noqa: F401
    REFERENCE_QUERIES,
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=8, shuffle_partitions=16)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_pd():
    return transcripts_pandas(n_convs=N_CONVS, seed=SEED)


@pytest.fixture(scope="session")
def transcripts_df(spark):
    return synth_transcripts(spark, n_convs=N_CONVS, seed=SEED)


@pytest.fixture(scope="session")
def index_dir(spark, transcripts_df):
    d = tempfile.mkdtemp(prefix="res_idx_")
    build_index(transcripts_df, d, n_buckets=8)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def reader(spark, index_dir):
    # driver_local_max_postings=0: the session reader exercises the
    # DISTRIBUTED engine (at this corpus size every query would otherwise
    # take the zero-Spark-job driver-local shortcut and the scan / prune /
    # fold machinery would lose its entire test surface). The shortcut
    # itself is covered by tests/test_driver_local.py, which compares it
    # bit-for-bit against this reader.
    # driver_local_max_vocab=0 likewise pins the fuzzy EXPANSION to the
    # one-JVM-job vocabulary scan (test_driver_local.py covers the
    # driver-local expansion twin bit-for-bit).
    return IndexReader(spark, index_dir, driver_local_max_postings=0,
                       driver_local_max_vocab=0)


@pytest.fixture(scope="session")
def oracle(transcripts_pd):
    return BM25Oracle(transcripts_pd)
