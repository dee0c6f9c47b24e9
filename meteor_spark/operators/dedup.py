"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Beyond-reference operators (BASELINE.json north star) designed for a
100 TB documents table:

- exact_duplicates / dedup_exact: hash-groupBy on a content fingerprint.
  One shuffle on a short hash key; survivor = min(doc_id) per group so
  output is deterministic.

- MinHash+LSH: shingle -> minhash signature -> band -> bucket-join.
  The minhash of a permutation is approximated as the lexicographic MIN
  of md5(seed || shingle) — md5 is stable across engines (the DuckDB
  oracle runs the identical construction), and per-seed mins are
  computed with built-in array functions only: no UDF, no ML-pipeline
  dependency, whole-stage codegen end to end. Candidate pairs only form
  within an LSH band bucket (the classic S-curve), so the join is a
  bucket-equi-join, not a cross product: at 1000 executors the shuffle
  key is (band_index, band_hash) which distributes uniformly.

- SimHash: 32-bit sign-sum sketch over word md5 bits, expressed
  relationally (explode words x bit positions -> groupBy doc) so both
  Spark and the SQL oracle agree bit-for-bit.

- n-gram Jaccard: exact pairwise verification used on LSH candidates
  (and directly on small blocks): |A ∩ B| / |A ∪ B| over distinct word
  sets with array_intersect/array_union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

from meteor_spark.operators.text import normalize_text, words


# ---------------------------------------------------------------- exact

def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Duplicate groups by exact (normalized) content hash.

    Returns (fingerprint, n_docs, doc_ids sorted) for groups with >1 doc.
    """
    fp = F.md5(normalize_text(F.col(text_col)))
    return (
        df.select(fp.alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.array_sort(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one survivor (min id) per exact-content group.

    Window-free formulation: groupBy(hash) -> min(id) -> semi-join back.
    The semi join is on (hash, id), broadcast when the survivor set is
    small; at scale AQE picks the strategy.
    """
    fp = F.md5(normalize_text(F.col(text_col))).alias("__fp")
    with_fp = df.select("*", fp)
    survivors = with_fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return with_fp.join(survivors, ["__fp", id_col], "left_semi").drop("__fp")


# ------------------------------------------------------------- shingles

def shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles of normalized text (array<string>)."""
    ws = words(normalize_text(text))
    n = F.size(ws)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(ws, i, k)),
    )
    return F.array_distinct(grams)


def minhash_signature(sh: Column, num_hashes: int = 12) -> Column:
    """Array of num_hashes minhashes: lexicographic min of md5(seed||s).

    array_min over a transform keeps everything inside codegen; each
    hash family member is an independent 'permutation' keyed by seed.
    """
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s, seed=i: F.md5(F.concat(F.lit(f"{seed}|"), s))))
            for i in range(num_hashes)
        ]
    )


# --------------------------------------------------------- minhash lsh

def minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """(id, band_index, band_key): LSH banding of minhash signatures.

    rows_per_band = num_hashes // bands; band_key = md5 of the
    concatenated minhashes in that band.
    """
    rows = num_hashes // bands
    sig = minhash_signature(shingles(F.col(text_col), k), num_hashes)
    base = df.select(F.col(id_col), sig.alias("sig"))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *[F.element_at(F.col("sig"), b * rows + r + 1) for r in range(rows)])).alias(
                    "band_key"
                ),
            )
            for b in range(bands)
        ]
    )
    return base.select(F.col(id_col), F.explode(band_structs).alias("bk")).select(
        F.col(id_col), F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing at least one LSH band.

    Self-join is on (band, band_key) — an equi-join whose key count grows
    with corpus size, so it parallelizes; within-bucket pair blowup is
    bounded by bucket size (hot buckets = near-identical content).
    """
    b = minhash_bands(df, text_col, id_col, k, num_hashes, bands)
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(r, ["band", "band_key"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    round_to: int = 4,
) -> DataFrame:
    """Verify candidate pairs with exact shingle Jaccard; keep >= threshold."""
    docs = df.select(F.col(id_col), shingles(F.col(text_col), k).alias("sh"))
    a = docs.alias("da")
    b = docs.alias("db")
    joined = (
        pairs.join(a, pairs.a == F.col(f"da.{id_col}"))
        .join(b, pairs.b == F.col(f"db.{id_col}"))
        .select(
            "a",
            "b",
            F.round(
                F.size(F.array_intersect("da.sh", "db.sh")).cast("double")
                / F.size(F.array_union("da.sh", "db.sh")),
                round_to,
            ).alias("jaccard"),
        )
    )
    return joined.filter(F.col("jaccard") >= threshold)


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Full pipeline: LSH candidates -> exact Jaccard verification."""
    pairs = minhash_candidate_pairs(df, text_col, id_col, k, num_hashes, bands)
    return jaccard_pairs(df, pairs, text_col, id_col, k, threshold)


# -------------------------------------------------------------- simhash

def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """32-bit SimHash per document, relational formulation.

    explode(words) x explode(bit positions) -> per-(doc,bit) signed sum ->
    per-doc hash = Σ (sum>0) << bit. Bit b of word w is taken from hex
    digit b//4 of md5(w): (digit_value >> (b%4)) & 1. Pure integer
    arithmetic on md5 hex — portable to the SQL oracle verbatim.

    Two shuffles (doc,bit then doc); at scale the first groupBy is
    map-side-combined so the shuffle carries at most |docs| x bits rows.
    """
    w = df.select(F.col(id_col), F.explode(F.array_distinct(words(normalize_text(F.col(text_col))))).alias("w"))
    pos = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("pos")
    wb = w.select(id_col, "w", pos).withColumn(
        "hexval",
        F.instr(F.lit("0123456789abcdef"), F.substring(F.md5(F.col("w")), (F.col("pos") / 4).cast("int") + 1, 1)) - 1,
    )
    # bit = (hexval >> (pos % 4)) & 1; contribution = 2*bit - 1
    contrib = F.expr("(shiftright(hexval, pos % 4) & 1) * 2 - 1").alias("contrib")
    return (
        wb.select(id_col, "pos", contrib)
        .groupBy(id_col, "pos")
        .agg(F.sum("contrib").alias("s"))
        .groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), pos)")).otherwise(F.lit(0))).alias(
                "simhash"
            )
        )
    )
