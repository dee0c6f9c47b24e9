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
