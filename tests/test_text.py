"""Text analysis operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from meteor_spark.operators import text


def _one(spark, t, col):
    return spark.createDataFrame([(t,)], "text string").select(col.alias("v")).first()["v"]


def test_token_count(spark):
    assert _one(spark, "a b  c", text.token_count(F.col("text"))) == 3


def test_regex_token_count(spark):
    # letters / digits / symbol singletons
    assert _one(spark, "hello world42!", text.regex_token_count(F.col("text"))) == 4


def test_lang_id(spark):
    assert _one(spark, "the cat and the dog in a house", text.lang_id(F.col("text"))) == "en"
    assert _one(spark, "der hund und die katze ist nicht da", text.lang_id(F.col("text"))) == "de"
    assert _one(spark, "xyzzy qwerty zzz", text.lang_id(F.col("text"))) == "und"


def test_fingerprint_normalization(spark):
    a = _one(spark, "Hello   World", text.fingerprint(F.col("text")))
    b = _one(spark, "hello world", text.fingerprint(F.col("text")))
    assert a == b and len(a) == 16


def test_quality_score_range(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = docs.select(text.quality_score(F.col("text")).alias("q")).agg(
        F.min("q"), F.max("q")
    ).first()
    assert 0.0 <= stats[0] and stats[1] <= 1.0


def test_analyze_schema(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = text.analyze(docs)
    assert set(out.columns) == {
        "doc_id", "lang_guess", "n_tokens", "n_regex_tokens", "n_chars",
        "mean_token_len", "punct_ratio", "stopword_ratio", "uppercase_ratio",
        "quality", "fingerprint",
    }
    assert out.count() == docs.count()
