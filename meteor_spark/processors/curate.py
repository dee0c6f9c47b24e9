"""Training-data curation processors for the recipe engine.

`curate` applies the standard pretraining-corpus cuts in one declarative
plan (all JVM-side expressions from operators.text / operators.dedup —
the same primitives the gated queries check row-exactly):

    language filter -> token-count bounds -> quality cut -> PII scrub
    -> exact-dedup survivors

`chunk` splits surviving documents into overlapping token windows
(operators.text.chunk_documents) — the pre-tokenization step before
sequence packing.

Both are ordinary recipe processors, so the whole curation pipeline is
drivable from YAML: source parquet_table -> [curate, chunk] -> file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meteor_spark.plugins_base import Field, Processor
from meteor_spark.registry import register_processor


@register_processor(
    "curate",
    "Corpus curation: lang filter, token bounds, quality cut, PII scrub, exact dedup",
    sample_config="lang: en\nmin_quality: 0.5\nscrub_pii: true\ndedup: true",
)
class CurateProcessor(Processor):
    CONFIG = {
        "text_col": Field(default="text", type=str),
        "id_col": Field(default="doc_id", type=str),
        "lang": Field(default=None, type=str),  # keep docs whose lang_id == lang
        "min_tokens": Field(default=None, type=int),
        "max_tokens": Field(default=None, type=int),
        "min_quality": Field(default=None, type=float),  # quality_score cut in [0,1]
        "min_char_entropy": Field(default=None, type=float),  # char-entropy floor (bits)
        "min_novelty": Field(default=None, type=float),  # distinct-3gram novelty floor
        "scrub_pii": Field(default=False),
        "dedup": Field(default=False),  # exact-content survivors (min id)
    }

    def process(self, df: DataFrame) -> DataFrame:
        from meteor_spark.operators import dedup, text

        c = self.config
        t = F.col(c["text_col"])
        if c["lang"]:
            df = df.filter(text.lang_id(t) == c["lang"])
        if c["min_tokens"] is not None:
            df = df.filter(text.token_count(t) >= int(c["min_tokens"]))
        if c["max_tokens"] is not None:
            df = df.filter(text.token_count(t) <= int(c["max_tokens"]))
        if c["min_quality"] is not None:
            df = df.filter(text.quality_score(t) >= float(c["min_quality"]))
        if c["min_char_entropy"] is not None:
            # entropy/novelty are corpus aggregates, not row expressions:
            # gate via a semi-join against the passing id set
            ok = text.char_entropy_profile(df, c["text_col"], c["id_col"]).filter(
                F.col("char_entropy") >= float(c["min_char_entropy"])
            )
            df = df.join(ok.select(c["id_col"]), c["id_col"], "left_semi")
        if c["min_novelty"] is not None:
            ok = text.doc_novelty_scores(df, text_col=c["text_col"], id_col=c["id_col"]).filter(
                F.col("novelty") >= float(c["min_novelty"])
            )
            df = df.join(ok.select(c["id_col"]), c["id_col"], "left_semi")
        if c["scrub_pii"]:
            df = df.withColumn(c["text_col"], text.scrub_pii(t))
        if c["dedup"]:
            df = dedup.dedup_exact(df, text_col=c["text_col"], id_col=c["id_col"])
        return df


@register_processor(
    "chunk",
    "Split documents into overlapping token windows",
    sample_config="chunk_size: 512\noverlap: 64",
)
class ChunkProcessor(Processor):
    CONFIG = {
        "text_col": Field(default="text", type=str),
        "id_col": Field(default="doc_id", type=str),
        "chunk_size": Field(default=512, type=int),
        "overlap": Field(default=64, type=int),
    }

    def process(self, df: DataFrame) -> DataFrame:
        from meteor_spark.operators.text import chunk_documents

        c = self.config
        return chunk_documents(
            df,
            text_col=c["text_col"],
            id_col=c["id_col"],
            chunk_size=int(c["chunk_size"]),
            overlap=int(c["overlap"]),
        )
