"""BM25 retrieval, DSIR reweighting, passage dedup, training-order
interleave — behavior + plan-shape checks for the round-3 additions."""

from __future__ import annotations

from pyspark.sql import functions as F

from meteor_spark.operators.dedup import passage_dedup
from meteor_spark.operators.retrieval import bm25_topk
from meteor_spark.operators.sampling import dsir_log_weights, training_order_interleave


def _docs_frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_bm25_ranks_term_dense_docs_first(spark):
    docs = _docs_frame(
        spark,
        [
            (1, "spark spark spark join", "en", "a"),
            (2, "spark filler filler filler filler filler filler filler", "en", "a"),
            (3, "nothing relevant here at all", "en", "a"),
            (4, "window hash spark", "en", "a"),
        ],
    )
    out = bm25_topk(docs, ("spark", "window", "hash"), k=10).collect()
    ids = [r.doc_id for r in out]
    assert 3 not in ids  # no query term -> never scored
    assert ids[0] == 4  # matches all three terms, shortest doc
    by_id = {r.doc_id: r for r in out}
    assert by_id[4].n_terms == 3 and by_id[1].n_terms == 1
    # tf saturation: doc1 (tf=3) must beat doc2 (tf=1, longer)
    assert by_id[1].bm25 > by_id[2].bm25


def test_bm25_plan_filters_terms_before_aggregation(spark):
    docs = _docs_frame(spark, [(1, "spark join", "en", "a")])
    plan = bm25_topk(docs, ("spark",), k=5)._jdf.queryExecution().optimizedPlan().toString()
    # the isin() term filter must sit below the tf aggregate, and top-k
    # must not be a global sort
    assert "Filter" in plan
    physical = bm25_topk(docs, ("spark",), k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in physical
    assert "CartesianProduct" not in physical  # scalar joins are broadcast


def test_dsir_weights_favor_target_like_docs(spark):
    rows = [(i, "alpha beta gamma delta", "en", "a") for i in range(10)]
    rows += [(100 + i, "uno dos tres cuatro", "es", "b") for i in range(10)]
    # one doc of each language flavor, weights must separate them
    docs = _docs_frame(spark, rows)
    out = dsir_log_weights(docs, F.col("lang") == "en").collect()
    w = {r.doc_id: r.log_weight for r in out}
    assert all(w[i] > w[100 + j] for i in (0, 5) for j in (0, 5))
    assert all(r.n_tokens == 4 for r in out)


def test_dsir_is_deterministic_across_runs(spark):
    rows = [(i, f"tok{i % 7} tok{i % 3} shared", "en" if i % 2 else "de", "s") for i in range(30)]
    docs = _docs_frame(spark, rows)
    a = sorted(map(tuple, dsir_log_weights(docs, F.col("lang") == "en").collect()))
    b = sorted(map(tuple, dsir_log_weights(docs, F.col("lang") == "en").repartition(7).collect()))
    assert a == b


def test_passage_dedup_drops_later_copies_and_reassembles(spark):
    base = " ".join(f"w{i}" for i in range(16))  # exactly 2 chunks of 8
    uniq = " ".join(f"u{i}" for i in range(16))
    docs = _docs_frame(
        spark,
        [
            (1, base, "en", "a"),
            (2, base, "en", "a"),  # full copy -> loses both passages
            (3, uniq + " " + base, "en", "a"),  # 16-word prefix -> doc1's
            # passages recur chunk-ALIGNED at offset 16 and are dropped
            (4, "pad " + base, "en", "a"),  # 1-word shift -> no window of
            # doc4 matches doc1's passages; everything survives
        ],
    )
    out = {r.doc_id: r for r in passage_dedup(docs, chunk_words=8).collect()}
    assert out[1].n_chunks == 2 and out[1].kept_chunks == 2
    assert out[2].n_chunks == 2 and out[2].kept_chunks == 0
    assert out[2].new_text_hash is None
    assert out[3].n_chunks == 4 and out[3].kept_chunks == 2
    assert out[4].n_chunks == 3 and out[4].kept_chunks == 3
    # identical surviving text -> identical reassembly hash
    solo = {r.doc_id: r for r in passage_dedup(docs.filter("doc_id = 1"), chunk_words=8).collect()}
    assert solo[1].new_text_hash == out[1].new_text_hash


def test_hot_passage_scrub_drops_all_copies_of_hot_passages(spark):
    from meteor_spark.operators.dedup import hot_passage_scrub

    hot = " ".join(f"h{i}" for i in range(8))  # 1 chunk, appears 3x
    docs = _docs_frame(
        spark,
        [
            (1, hot, "en", "a"),
            (2, hot, "en", "a"),
            (3, hot + " " + " ".join(f"u{i}" for i in range(8)), "en", "a"),
            (4, " ".join(f"v{i}" for i in range(8)), "en", "a"),  # cold
        ],
    )
    out = {r.doc_id: r for r in hot_passage_scrub(docs, chunk_words=8, min_count=3).collect()}
    # hot passage occurs 3x -> EVERY copy dropped (vs passage_dedup's keep-first)
    assert out[1].kept_chunks == 0 and out[1].new_text_hash is None
    assert out[2].kept_chunks == 0
    assert out[3].n_chunks == 2 and out[3].kept_chunks == 1  # unique tail survives
    assert out[4].kept_chunks == 1  # cold passage untouched
    # min_count=4: only 3 copies exist, nothing is hot
    lax = {r.doc_id: r for r in hot_passage_scrub(docs, chunk_words=8, min_count=4).collect()}
    assert all(r.kept_chunks == r.n_chunks for r in lax.values())


def test_interleave_is_round_robin_and_seeded(spark):
    rows = [(i, "x", "en", f"s{i % 3}") for i in range(30)]
    docs = _docs_frame(spark, rows)
    out = training_order_interleave(docs).collect()
    # positions strictly increase and the first cycle hits every source once
    pos = [r.position for r in out]
    assert pos == sorted(pos) and len(set(pos)) == len(pos)
    first_cycle = [r.source for r in out[:3]]
    assert sorted(first_cycle) == ["s0", "s1", "s2"]
    # same input -> identical order regardless of partitioning
    again = training_order_interleave(docs.repartition(5)).collect()
    assert [r.doc_id for r in again] == [r.doc_id for r in out]


def test_passage_dedup_reassembly_identity_on_unique_corpus(spark):
    """With no duplicate passages anywhere, every doc survives intact and
    the reassembled text is byte-identical to the (normalized) original —
    checked via an independent Python md5, not Spark's."""
    import hashlib

    rows = [(i, " ".join(f"d{i}w{j}" for j in range(16)), "en", "s") for i in range(5)]
    docs = _docs_frame(spark, rows)
    out = {r.doc_id: r for r in passage_dedup(docs, chunk_words=8).collect()}
    for i, text, _, _ in rows:
        assert out[i].kept_chunks == out[i].n_chunks == 2
        assert out[i].new_text_hash == hashlib.md5(text.encode()).hexdigest()


def test_bm25_is_partitioning_invariant(spark):
    rows = [(i, f"spark tok{i % 5} window tok{i % 11} filler", "en", "s") for i in range(40)]
    docs = _docs_frame(spark, rows)
    a = [tuple(r) for r in bm25_topk(docs, ("spark", "window"), k=15).collect()]
    b = [tuple(r) for r in bm25_topk(docs.repartition(9), ("spark", "window"), k=15).collect()]
    assert a == b


def test_rrf_fuse_math_and_asymmetric_membership(spark):
    from meteor_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (4, 2)], "doc_id long, rank int")
    out = {r["doc_id"]: (r["n_systems"], r["rrf"]) for r in rrf_fuse([a, b], k=10, c=60).collect()}
    # doc 3 appears in both systems: 1/(60+3) + 1/(60+1)
    assert out[3] == (2, round(1 / 63 + 1 / 61, 6))
    # docs in one system only contribute a single term
    assert out[1] == (1, round(1 / 61, 6))
    assert out[4] == (1, round(1 / 62, 6))
    # cross-system doc outranks every single-system doc here
    assert max(out, key=lambda d: out[d][1]) == 3


def test_rrf_fuse_topk_and_tiebreak(spark):
    from meteor_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(i, 1) for i in range(5)], "doc_id long, rank int")
    out = rrf_fuse([a], k=3).collect()
    # equal scores -> deterministic id ascending tie-break, k rows
    assert [r["doc_id"] for r in out] == [0, 1, 2]


def test_rrf_fuse_empty_rankings_raises():
    import pytest

    from meteor_spark.operators.retrieval import rrf_fuse

    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([])


def test_cross_encoder_rerank_hand_checked(spark):
    from meteor_spark.operators.retrieval import cross_encoder_rerank

    docs = _docs_frame(
        spark,
        [
            # hits=min(3,3)+min(1,3)=4 (spark x3 capped, window x1); adj=3
            # (spark-spark, spark-spark, spark-window); dl=6
            (1, "spark spark spark window aa bb", "en", "s"),
            # hits=1, adj=0, dl=6
            (2, "spark aa bb cc dd ee", "en", "s"),
            # no query terms at all: hits=adj=0 -> score 0
            (3, "aa bb cc dd", "en", "s"),
        ],
    )
    cand = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    out = {
        r["doc_id"]: r
        for r in cross_encoder_rerank(cand, docs, ("spark", "window", "hash")).collect()
    }
    assert (out[1]["hits"], out[1]["adj"], out[1]["dl"]) == (4, 3, 6)
    # score = floor(1e6 * (4*4 + 2*3) / (4*4 + 2*3 + 6)) = floor(1e6*22/28)
    assert out[1]["score_ppm"] == 1_000_000 * 22 // 28
    assert (out[2]["hits"], out[2]["adj"]) == (1, 0)
    assert out[2]["score_ppm"] == 1_000_000 * 4 // 10
    assert out[3]["score_ppm"] == 0
    # ranking follows the joint-interaction score
    ranked = sorted(out, key=lambda d: (-out[d]["score_ppm"], d))
    assert ranked == [1, 2, 3]


def test_cross_encoder_rerank_scores_only_candidates_and_broadcasts(spark):
    from meteor_spark.operators.retrieval import cross_encoder_rerank

    docs = _docs_frame(
        spark, [(i, f"spark window tok{i}", "en", "s") for i in range(50)]
    )
    cand = spark.createDataFrame([(7,), (11,)], "doc_id long")
    df = cross_encoder_rerank(cand, docs, ("spark", "window"), k=10)
    rows = df.collect()
    assert sorted(r["doc_id"] for r in rows) == [7, 11]
    # the bounded candidate list must broadcast into the corpus scan:
    # no shuffle of the corpus, no sort-merge join
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cross_encoder_rerank_empty_and_degenerate_text(spark):
    from meteor_spark.operators.retrieval import cross_encoder_rerank

    # empty candidate list -> empty result, no error
    docs = _docs_frame(spark, [(1, "spark", "en", "s")])
    empty_cand = spark.createDataFrame([], "doc_id long")
    assert cross_encoder_rerank(empty_cand, docs, ("spark",)).count() == 0

    # empty/whitespace-only text tokenizes like the engines ([''], dl=1)
    # and publishes score 0 through the zero-guard, not a divide error
    weird = _docs_frame(spark, [(1, "", "en", "s"), (2, "   ", "en", "s")])
    cand = spark.createDataFrame([(1,), (2,)], "doc_id long")
    out = {r["doc_id"]: r for r in cross_encoder_rerank(cand, weird, ("spark",)).collect()}
    assert (out[1]["dl"], out[1]["score_ppm"]) == (1, 0)
    assert (out[2]["dl"], out[2]["score_ppm"]) == (1, 0)
