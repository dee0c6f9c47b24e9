"""PII scrubbing and corpus n-gram statistics."""

from pyspark.sql import functions as F

from meteor_spark.operators.text import corpus_top_ngrams, ngrams, scrub_pii


def _scrub_one(spark, s: str) -> str:
    return spark.createDataFrame([(s,)], ["t"]).select(scrub_pii(F.col("t")).alias("o")).first().o


def test_scrub_masks_each_kind(spark):
    out = _scrub_one(spark, "mail a@b.com or http://x.y/z from 192.168.0.1 call +1 555-0100 now")
    assert out == "mail <EMAIL> or <URL> from <IP> call <PHONE> now"


def test_scrub_url_wins_over_email(spark):
    # URLs containing '@' must become <URL>, not partially <EMAIL>
    out = _scrub_one(spark, "see https://user@host.com/path ok")
    assert out == "see <URL> ok"


def test_scrub_leaves_clean_text_alone(spark):
    s = "plain words only, nothing to hide 42"
    assert _scrub_one(spark, s) == s


def test_ngrams_keep_multiplicity(spark):
    df = spark.createDataFrame([("a b a b",)], ["text"])
    grams = df.select(ngrams(F.col("text"), 2).alias("g")).first().g
    assert grams == ["a b", "b a", "a b"]


def test_corpus_top_ngrams_orders_and_breaks_ties(spark):
    df = spark.createDataFrame([("x y x y",), ("z w",)], ["text"])
    rows = corpus_top_ngrams(df, n=2, k=3).collect()
    assert [(r.gram, r.n) for r in rows] == [("x y", 2), ("y x", 1), ("z w", 1)]
