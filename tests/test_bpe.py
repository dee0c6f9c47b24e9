"""BPE trainer + encoder: known-merge recovery, greedy semantics,
determinism, and the corpus-scale/driver-side split."""

from __future__ import annotations

from meteor_spark.operators.bpe import (
    _merge_word,
    encode_token_counts,
    encode_word,
    train_bpe,
    word_type_counts,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string",
    )


def test_merge_word_is_greedy_left_to_right():
    assert _merge_word(tuple("aaa"), "a", "a") == ("aa", "a")
    assert _merge_word(tuple("abab"), "a", "b") == ("ab", "ab")
    assert _merge_word(("x", "ab", "ab"), "ab", "ab") == ("x", "abab")


def test_train_recovers_dominant_pair(spark):
    # (z,z) occurs in all three word types (count 30); every other
    # adjacent pair occurs in only one (count 10)
    docs = _docs(spark, ["azz bzz czz"] * 10)
    rules, wt = train_bpe(docs, n_merges=2)
    assert rules[0][1:4] == ("z", "z", "zz") and rules[0][4] == 30
    # after the zz merge the three (x, zz) pairs tie at 10 -> lexicographic
    assert rules[1][1:4] == ("a", "zz", "azz")
    # word-type table collapsed duplicates: 'azz' counted 10 times
    assert {r["word"]: r["n"] for r in wt}["azz"] == 10


def test_tie_break_is_lexicographic(spark):
    docs = _docs(spark, ["ab cd ab cd"])  # both pairs count 2
    rules, _ = train_bpe(docs, n_merges=1)
    assert rules[0][1:4] == ("a", "b", "ab")


def test_encode_matches_trainer_merges(spark):
    docs = _docs(spark, ["lower lowest low low lower"])
    rules, _ = train_bpe(docs, n_merges=5)
    ranks = {(r[1], r[2]): r[0] for r in rules}
    # encoding 'low' after 'lo'+'w' style merges must reproduce exactly
    # the trainer's final segmentation of that word type
    vocab = {"low": tuple("low")}
    for _, a, b, _m, _c in rules:
        vocab = {w: _merge_word(t, a, b) for w, t in vocab.items()}
    assert tuple(encode_word("low", ranks)) == vocab["low"]


def test_encode_token_counts_bounds_and_join(spark):
    docs = _docs(spark, ["aaa bbb aaa", "cc dd"])
    rules, _ = train_bpe(docs, n_merges=4)
    out = {r.doc_id: r for r in encode_token_counts(docs, rules).collect()}
    assert out[0].n_words == 3 and out[1].n_words == 2
    # n_words <= n_subwords <= n_chars
    assert 3 <= out[0].n_subwords <= 9
    assert 2 <= out[1].n_subwords <= 4


def test_training_is_partitioning_invariant(spark, sf_dir):
    from meteor_spark.io import read_parquet_table

    docs = read_parquet_table(spark, f"{sf_dir}/documents.parquet")
    r1, _ = train_bpe(docs, n_merges=8)
    r2, _ = train_bpe(docs.repartition(7), n_merges=8)
    assert r1 == r2


def test_encode_rank_priority_equals_rank_order_exhaustive(spark, sf_dir):
    """The invariant the bpe_encode_stats oracle rests on: encoding by
    lowest-rank-pair-first (encode_word) equals applying the rules in
    rank order, each exhaustively left-to-right (_merge_word — what the
    trainer's vocab update and the oracle's chained CTEs do). Holds
    because a rank-r merge only creates tokens that appear in rules of
    rank > r. Checked over EVERY word type in the fixture corpus."""
    from meteor_spark.io import read_parquet_table

    docs = read_parquet_table(spark, f"{sf_dir}/documents.parquet")
    rules, wt = train_bpe(docs, n_merges=20)
    ranks = {(r[1], r[2]): r[0] for r in rules}
    for row in wt:
        toks = tuple(row["word"])
        for _, a, b, _m, _c in rules:
            toks = _merge_word(toks, a, b)
        assert tuple(encode_word(row["word"], ranks)) == toks, row["word"]


def test_encode_token_counts_custom_id_col_groups_per_key(spark):
    docs = spark.createDataFrame(
        [(0, "aa bb", "en", "s"), (1, "aa", "en", "s"), (2, "cc", "de", "s")],
        "doc_id long, text string, lang string, source string",
    )
    rules, _ = train_bpe(docs, n_merges=2)
    out = {r["lang"]: r for r in encode_token_counts(docs, rules, id_col="lang").collect()}
    assert out["en"]["n_words"] == 3 and out["de"]["n_words"] == 1
    assert out["de"]["n_subwords"] >= 1
