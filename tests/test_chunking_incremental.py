"""Document chunking and incremental dedup."""

from pyspark.sql import functions as F

from meteor_spark.operators.dedup import dedup_incremental
from meteor_spark.operators.text import chunk_documents


def test_chunks_cover_tail_with_overlap(spark):
    txt = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, txt)], ["doc_id", "text"])
    rows = sorted(chunk_documents(df, chunk_size=4, overlap=2).collect(), key=lambda r: r.chunk_start)
    # stride 2, starts while s <= n - overlap = 8 -> 1,3,5,7
    assert [r.chunk_start for r in rows] == [1, 3, 5, 7]
    assert rows[0].chunk == "w0 w1 w2 w3"
    assert rows[-1].chunk == "w6 w7 w8 w9"  # tail covered exactly
    assert all(r.n_tokens == 4 for r in rows)


def test_short_doc_yields_one_chunk(spark):
    df = spark.createDataFrame([(1, "only three words")], ["doc_id", "text"])
    rows = chunk_documents(df, chunk_size=32, overlap=8).collect()
    assert len(rows) == 1 and rows[0].n_tokens == 3


def test_incremental_dedup_drops_known_and_batch_dups(spark):
    corpus = spark.createDataFrame([(1, "alpha beta"), (2, "gamma delta")], ["doc_id", "text"])
    new = spark.createDataFrame(
        [
            (10, "alpha beta"),     # already in corpus -> dropped
            (11, "Alpha   BETA"),   # same after normalization -> dropped
            (12, "epsilon zeta"),   # new -> kept
            (13, "epsilon zeta"),   # batch-internal dup -> min id (12) kept
        ],
        ["doc_id", "text"],
    )
    kept = sorted(r.doc_id for r in dedup_incremental(new, corpus).collect())
    assert kept == [12]
