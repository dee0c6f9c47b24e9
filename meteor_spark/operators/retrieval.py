"""Sparse lexical retrieval over the document corpus: BM25 top-k.

Beyond-reference operator (BASELINE.json north star): a training-data
pipeline needs corpus search — picking the documents most relevant to a
probe query drives targeted curation (DSIR-style target matching,
contamination triage, eyeball sampling of a topic).

Formulation is the classic inverted-index join, fully relational:

    postings(term, doc_id, tf)  ⋈  query_terms  →  per-doc score sum

Scale design:
- The term filter lands BEFORE the (doc, term) aggregation, so the
  postings frame only ever contains rows for the query's terms — at
  100 TB the explode+filter prunes inside the scan stage and the
  shuffled aggregate carries |matching docs| × |query terms| rows,
  not the corpus vocabulary.
- Per-term document frequencies and the corpus scalars (N, avgdl) are
  tiny aggregates broadcast to the score join; nothing large shuffles
  twice.
- Top-k is orderBy+limit → TakeOrderedAndProject (per-partition heaps,
  no global sort).
- Everything is pyspark.sql.functions — no Python in the hot path —
  and md5-free, so the oracle twin is plain SQL arithmetic.

No reference twin (odpf/meteor has no search operator); determinism
contract follows meteor_spark.queries (round(score, 4), tie-break on
doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meteor_spark.operators.text import normalize_text, words


def bm25_topk(
    df: DataFrame,
    terms: tuple[str, ...],
    k: int = 25,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 4,
) -> DataFrame:
    """Top-k documents for a bag-of-words query under Okapi BM25.

    idf(t)   = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score(d) = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

    Returns (id_col, n_terms, bm25) ordered by (bm25 desc, id).
    """
    base = df.select(F.col(id_col), words(normalize_text(F.col(text_col))).alias("__ws"))

    # one pass: doc length travels with the exploded token, so matched
    # docs never join back against the full corpus for dl
    tok = base.select(
        F.col(id_col),
        F.size("__ws").alias("dl"),
        F.explode("__ws").alias("w"),
    ).filter(F.col("w").isin(list(terms)))
    tf = tok.groupBy(id_col, "dl", "w").agg(F.count("*").alias("tf"))

    # corpus scalars: one tiny agg row, broadcast via crossJoin
    stats = base.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.size("__ws")).alias("avgdl"),
    )
    # per-term document frequency: (doc, term) is unique in tf
    dfreq = tf.groupBy("w").agg(F.count("*").cast("double").alias("dft"))

    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5))
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "w")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_terms"),
            F.round(F.sum(idf * tf_part), round_to).alias("bm25"),
        )
    )
    return scored.orderBy(F.col("bm25").desc(), id_col).limit(k)


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 10,
    c: int = 60,
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. SIGIR'09) of N ranked
    lists: score(d) = Σ_systems 1/(c + rank_s(d)) — the standard hybrid
    lexical+vector combiner, needing no score calibration between
    systems because only RANKS enter the sum.

    Each input frame carries (id_col, rank). Union + one groupBy handles
    membership asymmetry for free (a doc missing from a system simply
    contributes no term — full-outer-join semantics without a join), so
    the plan is a single map-side-combined aggregation over the
    concatenated candidate lists, then TakeOrdered top-k. Candidate
    lists are top-L per system (L ~ 10²-10³), so at 100 TB the fusion
    input is tiny regardless of corpus size — the heavy lifting stays in
    the per-system retrievers.
    """
    if not rankings:
        raise ValueError("rrf_fuse: rankings must be non-empty")
    u = rankings[0].select(id_col, "rank")
    for r in rankings[1:]:
        u = u.unionByName(r.select(id_col, "rank"))
    fused = u.groupBy(id_col).agg(
        F.count("*").alias("n_systems"),
        F.round(F.sum(1.0 / (F.lit(c) + F.col("rank"))), round_to).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), id_col).limit(k)


def cross_encoder_rerank(
    candidates: DataFrame,
    docs: DataFrame,
    query_terms: tuple[str, ...],
    k: int = 10,
    tf_cap: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rerank a bounded candidate list by jointly scoring each
    (query, document) pair — the third stage of the production
    retrieve -> fuse -> rerank pipeline (first stage: bm25_topk /
    ANN; second: rrf_fuse).

    The scorer here is a deterministic STUB in the cross-encoder
    SHAPE: it consumes the raw pair (query terms + full document
    text) through one Arrow-batched mapInPandas stage and emits
    joint interaction features — exactly where a real cross-encoder
    forward pass plugs in (swap `_score_batches`; the Spark-side
    plumbing, broadcast pattern, and batch shape are the product).
    Stub features, all exact integers so the gate is bit-stable:

      hits = Σ_t min(tf_d(t), tf_cap)   saturating query-term frequency
      adj  = #{i : w_i ∈ Q and w_{i+1} ∈ Q}   adjacent-pair interaction
      dl   = document token count

      score_ppm = floor(1e6 · (4·hits + 2·adj) / (4·hits + 2·adj + dl))

    published via exactmath.ppm_expr (overflow-free on both engines).

    Scale design: the candidate list is top-L-bounded (10^1-10^3 rows
    regardless of corpus size), so it BROADCASTS into the corpus scan
    to fetch text — one pass over documents, no shuffle of the corpus,
    no SortMergeJoin — and the Python stage sees only |candidates|
    rows. Reranking cost is O(L · model), never O(corpus)."""
    from meteor_spark.functions.exactmath import ppm_expr

    # document tokens are lowercased before matching (below), so the
    # query side must be too — an unnormalized caller term would
    # otherwise silently never match and score the doc 0, diverging
    # from the engine-side SQL contract (terms written pre-normalized)
    qset = {t.lower() for t in query_terms}

    def _score_batches(batches):
        # the model seam: one pandas frame in, joint features out.
        # A real cross-encoder replaces the body with tokenizer +
        # forward pass over (query, text) pairs, batched by Arrow.
        import pandas as pd

        for pdf in batches:
            hits, adj, dl = [], [], []
            for text in pdf[text_col]:
                # normalize-then-split-on-single-space, NOT bare
                # .split(): an empty/whitespace-only document must
                # tokenize to [''] (dl = 1), matching the engines'
                # split semantics (queries._NORM_SQL + regexp_split /
                # text.words) so the length normalizer agrees
                ws = " ".join((text or "").lower().split()).split(" ")
                dl.append(len(ws))
                counts: dict[str, int] = {}
                for w in ws:
                    if w in qset:
                        counts[w] = counts.get(w, 0) + 1
                hits.append(sum(min(c, tf_cap) for c in counts.values()))
                adj.append(
                    sum(
                        1
                        for i in range(len(ws) - 1)
                        if ws[i] in qset and ws[i + 1] in qset
                    )
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col], "hits": hits, "adj": adj, "dl": dl}
            )

    cand_docs = docs.select(id_col, text_col).join(
        F.broadcast(candidates.select(id_col)), id_col
    )
    feats = cand_docs.mapInPandas(
        _score_batches, schema=f"{id_col} long, hits long, adj long, dl long"
    )
    # greatest(n, 1): an empty document (dl = 0) has numerator 0 too,
    # so the clamp publishes 0 instead of dividing by zero (DuckDB
    # errors on // 0 where Spark div returns NULL)
    scored = feats.select(
        id_col,
        "hits",
        "adj",
        "dl",
        F.expr(
            ppm_expr(
                "(4 * hits + 2 * adj)",
                "greatest(4 * hits + 2 * adj + dl, 1)",
                "div",
            )
        )
        .cast("long")
        .alias("score_ppm"),
    )
    return scored.orderBy(F.col("score_ppm").desc(), id_col).limit(k)
