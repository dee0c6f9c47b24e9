"""Sequence packing: concat-and-chunk manifest for LM training batches.

Beyond-reference operator (training-data pipeline family). Language-model
training consumes fixed-length token sequences; the standard GPT-style
preparation concatenates documents in a deterministic order and slices
the stream into length-L windows. This operator computes the PACKING
MANIFEST — for every document, which sequence(s) it lands in and at what
offset — as a pure relational plan, so the expensive token-moving job
can be sharded by sequence id afterwards (or skipped entirely when the
trainer reads the manifest directly).

Scale: one cumulative-sum window per stream group (e.g. `source`), which
shuffles each group once on its sort key — the same cost as any
deterministic manifest build. Groups pack independently, so parallelism
is #groups-wide and a new crawl batch only repacks the groups it
touches. No Python, no UDFs — the whole plan is codegen'd arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_manifest(
    df: DataFrame,
    token_col,
    seq_len: int,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document packing coordinates under concat-and-chunk.

    Documents order by `id_col` within each `group_col` stream; the
    token stream position of a document is the running sum of prior
    token counts. Emitted columns (all 0-based, sequences local to the
    group):
      first_seq  — index of the sequence the document starts in
      seq_offset — token offset of the document within that sequence
      n_seqs     — how many length-`seq_len` sequences the doc spans
      n_tokens   — the document's own token count

    `token_col` may be a column name or Column expression (e.g. a
    whitespace token count derived from text).
    """
    tokens = F.col(token_col) if isinstance(token_col, str) else token_col
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tokens).over(w), F.lit(0))
    return df.select(
        F.col(id_col),
        F.col(group_col),
        tokens.cast("long").alias("n_tokens"),
        F.floor(cum_before / seq_len).alias("first_seq"),
        (cum_before % seq_len).alias("seq_offset"),
        F.when(tokens <= 0, F.lit(0))
        .otherwise(
            F.floor((cum_before + tokens - 1) / seq_len) - F.floor(cum_before / seq_len) + 1
        )
        .alias("n_seqs"),
    )


def next_fit_bins(
    df: DataFrame,
    token_col: str = "n_tokens",
    capacity: int = 512,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequential NEXT-FIT bin packing: documents flow in `id_col` order
    within each `group_col` stream; each lands in the current open bin
    unless it would overflow `capacity`, in which case the bin closes and
    a fresh one opens. Unlike `pack_manifest` (concat-and-chunk, docs
    split across sequence boundaries), next-fit keeps every document
    WHOLE inside one bin — the padding-based packing used when documents
    must not be split (instruction tuning, contrastive pairs, eval sets).

    Emitted per document: `bin_id` (0-based, local to the stream) and
    `bin_offset` (token position inside the bin). A document larger than
    `capacity` gets a bin of its own (next-fit never splits); a
    non-positive token count occupies zero width at the current offset.

    Execution: the recurrence (bin, fill) -> next (bin, fill) is
    non-associative — no window/prefix-sum formulation exists — so this
    is the documented applyInPandas case: one Arrow batch per stream,
    a numpy-backed sequential loop inside. State is two integers.

    Scale: parallelism is #streams-wide and each stream must fit one
    executor's Arrow batch. For an unbounded stream at 100 TB, salt the
    stream key (group_col = (source, hash_bucket(doc_id) % S)) exactly as
    sampling.hash_bucket does: sub-streams pack independently and bin ids
    are namespaced by (stream, salt) — packing quality is unchanged
    (next-fit has no cross-bin lookback) and group size is bounded by
    construction.
    """
    import numpy as np
    import pandas as pd

    in_schema = {f.name: f.dataType for f in df.schema.fields}
    out_schema = T.StructType(
        [
            T.StructField(id_col, in_schema[id_col]),
            T.StructField(group_col, in_schema[group_col]),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("bin_id", T.LongType()),
            T.StructField("bin_offset", T.LongType()),
        ]
    )
    cap = int(capacity)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        # NULL counts ride the non-positive path (zero width, occupies
        # no capacity) — a bare to_numpy(int64) would crash the whole
        # Arrow batch with an opaque NaN-cast error
        toks = np.maximum(
            pdf[token_col].fillna(0).to_numpy(dtype=np.int64), 0
        )
        n = len(toks)
        bin_id = np.empty(n, dtype=np.int64)
        offset = np.empty(n, dtype=np.int64)
        b = 0
        fill = 0
        for i in range(n):
            t = int(toks[i])
            if fill > 0 and fill + t > cap:
                b += 1
                fill = 0
            bin_id[i] = b
            offset[i] = fill
            fill += t
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                group_col: pdf[group_col].to_numpy(),
                "n_tokens": pdf[token_col].fillna(0).to_numpy(dtype=np.int64),
                "bin_id": bin_id,
                "bin_offset": offset,
            }
        )

    cols = [id_col, group_col, token_col]
    return df.select(*cols).groupBy(group_col).applyInPandas(pack, schema=out_schema)


def truncation_budget_curve(
    df: DataFrame,
    token_col,
    candidate_lens: tuple[int, ...] = (16, 24, 32, 48, 64),
    round_to: int = 6,
) -> DataFrame:
    """Token loss at each candidate max-sequence-length: one row per L
    with (max_len, docs_truncated, tokens_dropped, drop_share).

    The policy question this answers: "what max_seq_len keeps truncation
    loss under ε?" — the trainer picks the smallest L whose drop_share
    clears its budget, instead of guessing from a histogram. One scan:
    each row fans out to |candidate_lens| literal rows (a constant-width
    explode, not data-dependent), and the map-side-combined groupBy
    ships exactly |candidate_lens| partial rows per partition regardless
    of corpus size. No Python, no window, no second pass.
    """
    tokens = F.col(token_col) if isinstance(token_col, str) else token_col
    fan = df.select(
        tokens.cast("long").alias("t"),
        F.explode(F.array(*[F.lit(l) for l in candidate_lens])).alias("max_len"),
    )
    dropped = F.greatest(F.col("t") - F.col("max_len"), F.lit(0))
    return (
        fan.groupBy("max_len")
        .agg(
            F.sum((F.col("t") > F.col("max_len")).cast("long")).alias("docs_truncated"),
            F.sum(dropped).alias("tokens_dropped"),
            F.round(
                F.sum(dropped).cast("double") / F.sum("t").cast("double"), round_to
            ).alias("drop_share"),
        )
        .orderBy("max_len")
    )


def padding_waste_by_bucket(
    df: DataFrame,
    token_col,
    min_cap: int = 16,
    max_cap: int = 1 << 20,
) -> DataFrame:
    """Padding overhead under length-bucketed batching: one row per
    power-of-two bucket cap with (bucket_cap, n_docs, total_tokens,
    total_padding, pad_ppm).

    The batching question this answers: "if sequences are grouped into
    pow-2 length buckets and padded to the bucket cap (the standard
    alternative to concat-and-chunk when document boundaries must
    survive), how many tokens does each bucket burn as padding?" — the
    planner reads pad_ppm to decide where packing (pack_manifest) beats
    bucketing. One scan, map-side-combined groupBy of |buckets| rows.

    Determinism: the cap is picked by a chained integer CASE over the
    pow-2 ladder — no float log2 whose rounding could disagree across
    engines at an exact boundary — and pad_ppm is exact integer
    arithmetic (functions.exactmath.ppm_expr: the overflow-free
    expansion of pad * 1e6 DIV capacity — the naive multiply leaves
    int64 at a few tens of TB of padding), bit-stable by construction.
    Documents longer than max_cap land in the top bucket with padding
    clamped at 0 (they'd be chunked upstream, truncation_budget_curve's
    territory).
    """
    from meteor_spark.functions.exactmath import ppm_expr

    tokens = F.col(token_col) if isinstance(token_col, str) else token_col
    caps = []
    c = min_cap
    while c < max_cap:
        caps.append(c)
        c <<= 1
    caps.append(max_cap)
    cap = F.lit(caps[-1])
    for p in reversed(caps[:-1]):
        cap = F.when(F.col("t") <= F.lit(p), F.lit(p)).otherwise(cap)
    b = df.select(tokens.cast("long").alias("t")).select("t", cap.alias("bucket_cap"))
    pad = F.greatest(F.col("bucket_cap") - F.col("t"), F.lit(0))
    return (
        b.groupBy("bucket_cap")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("t").alias("total_tokens"),
            F.sum(pad).alias("total_padding"),
        )
        .select(
            F.col("bucket_cap").cast("int").alias("bucket_cap"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
            F.col("total_padding").cast("long").alias("total_padding"),
            F.expr(ppm_expr("total_padding", "n_docs * bucket_cap", "div"))
            .cast("long")
            .alias("pad_ppm"),
        )
        .orderBy("bucket_cap")
    )
