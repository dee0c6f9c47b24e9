"""Data-mixing processors for the recipe engine: the round-3 curation
operators (DSIR reweighting, passage dedup, training-order interleave)
exposed as ordinary recipe steps, so a YAML pipeline can run

    parquet_table -> [curate, reweight, passage_dedup, interleave] -> file

end-to-end — the same pattern curate.py established (reference
processor plumbing: plugins/processors/enrich/processor.go:57-86; these
steps are beyond-reference capabilities on the same surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meteor_spark.plugins_base import Field, Processor
from meteor_spark.registry import register_processor


@register_processor(
    "reweight",
    "DSIR importance log-weights toward a target subcorpus, optional cut",
    sample_config="target_col: lang\ntarget_value: en\nmin_log_weight: 0.0",
)
class ReweightProcessor(Processor):
    CONFIG = {
        "text_col": Field(default="text", type=str),
        "id_col": Field(default="doc_id", type=str),
        "target_col": Field(required=True, type=str),
        "target_value": Field(required=True, type=str),
        "buckets": Field(default=256, type=int),
        "min_log_weight": Field(default=None, type=float),  # keep docs >= cut
    }

    def process(self, df: DataFrame) -> DataFrame:
        from meteor_spark.operators.sampling import dsir_log_weights

        c = self.config
        w = dsir_log_weights(
            df,
            F.col(c["target_col"]) == c["target_value"],
            buckets=int(c["buckets"]),
            text_col=c["text_col"],
            id_col=c["id_col"],
        ).select(c["id_col"], "log_weight")
        out = df.join(w, c["id_col"], "left")
        if c["min_log_weight"] is not None:
            out = out.filter(F.col("log_weight") >= float(c["min_log_weight"]))
        return out


def _swap_rebuilt_text(df: DataFrame, surv: DataFrame, text_col: str, id_col: str, drop_empty) -> DataFrame:
    """Replace text_col with the reassembled new_text from a passage
    operator's emit='text' frame; optionally drop fully-emptied docs."""
    out = (
        df.drop(text_col)
        .join(surv.select(id_col, "kept_chunks", "new_text"), id_col)
        .withColumnRenamed("new_text", text_col)
    )
    if drop_empty:
        out = out.filter(F.col("kept_chunks") > 0)
    return out.drop("kept_chunks")


@register_processor(
    "passage_dedup",
    "Drop passages already seen elsewhere in the corpus; reassemble docs",
    sample_config="chunk_words: 8\ndrop_empty: true",
)
class PassageDedupProcessor(Processor):
    CONFIG = {
        "text_col": Field(default="text", type=str),
        "id_col": Field(default="doc_id", type=str),
        "chunk_words": Field(default=8, type=int),
        "drop_empty": Field(default=True),  # drop docs whose every passage was a dup
    }

    def process(self, df: DataFrame) -> DataFrame:
        from meteor_spark.operators.dedup import passage_dedup

        c = self.config
        surv = passage_dedup(
            df,
            chunk_words=int(c["chunk_words"]),
            text_col=c["text_col"],
            id_col=c["id_col"],
            emit="text",
        )
        return _swap_rebuilt_text(df, surv, c["text_col"], c["id_col"], c["drop_empty"])


@register_processor(
    "boilerplate_scrub",
    "Drop every copy of passages repeating >= min_count corpus-wide; reassemble docs",
    sample_config="chunk_words: 8\nmin_count: 3\ndrop_empty: true",
)
class BoilerplateScrubProcessor(Processor):
    CONFIG = {
        "text_col": Field(default="text", type=str),
        "id_col": Field(default="doc_id", type=str),
        "chunk_words": Field(default=8, type=int),
        "min_count": Field(default=3, type=int),
        "drop_empty": Field(default=True),  # drop docs whose every passage was hot
    }

    def process(self, df: DataFrame) -> DataFrame:
        from meteor_spark.operators.dedup import hot_passage_scrub

        c = self.config
        surv = hot_passage_scrub(
            df,
            chunk_words=int(c["chunk_words"]),
            min_count=int(c["min_count"]),
            text_col=c["text_col"],
            id_col=c["id_col"],
            emit="text",
        )
        return _swap_rebuilt_text(df, surv, c["text_col"], c["id_col"], c["drop_empty"])


@register_processor(
    "interleave",
    "Seeded epoch shuffle + source round-robin training order",
    sample_config="group_col: source\nepoch: 0",
)
class InterleaveProcessor(Processor):
    CONFIG = {
        "id_col": Field(default="doc_id", type=str),
        "group_col": Field(default="source", type=str),
        "epoch": Field(default=0, type=int),
    }

    def process(self, df: DataFrame) -> DataFrame:
        from meteor_spark.operators.sampling import training_order_interleave

        c = self.config
        order = training_order_interleave(
            df, group_col=c["group_col"], id_col=c["id_col"], epoch=int(c["epoch"])
        ).select(c["id_col"], "position")
        return df.join(order, c["id_col"]).orderBy("position")


@register_processor(
    "pack",
    "Packing manifest: concat-and-chunk sequence coords or next-fit whole-doc bins",
    sample_config="mode: next_fit\ncapacity: 512\ngroup_col: source",
)
class PackProcessor(Processor):
    """Attach packing coordinates to every document: `mode: sequence`
    adds concat-and-chunk sequence coords (packing.pack_manifest),
    `mode: next_fit` adds whole-document bin assignments
    (packing.next_fit_bins). The token count is derived from the text
    column when no `token_col` is given."""

    CONFIG = {
        "mode": Field(default="next_fit", type=str),  # next_fit | sequence
        "text_col": Field(default="text", type=str),
        "id_col": Field(default="doc_id", type=str),
        "group_col": Field(default="source", type=str),
        "token_col": Field(default=None, type=str),
        "capacity": Field(default=512, type=int),
    }

    def process(self, df: DataFrame) -> DataFrame:
        from meteor_spark.operators import packing
        from meteor_spark.operators.text import normalize_text, token_count

        c = self.config
        if c["mode"] not in ("next_fit", "sequence"):
            raise ValueError(f"pack: unknown mode {c['mode']!r} (next_fit|sequence)")
        tok = c["token_col"]
        base = df
        if tok is None:
            tok = "__n_tokens"
            base = df.withColumn(tok, token_count(normalize_text(F.col(c["text_col"]))))
        fn = packing.next_fit_bins if c["mode"] == "next_fit" else packing.pack_manifest
        kw = {"capacity": int(c["capacity"])} if c["mode"] == "next_fit" else {"seq_len": int(c["capacity"])}
        manifest = fn(base, tok, group_col=c["group_col"], id_col=c["id_col"], **kw)
        # never re-attach a column the input already carries (the
        # manifest always aliases its count to n_tokens, and a duplicate
        # name makes every downstream select/write fail AMBIGUOUS)
        coord_cols = [
            x
            for x in manifest.columns
            if x not in (c["id_col"], c["group_col"]) and x not in df.columns
        ]
        return df.join(
            manifest.select(c["id_col"], *coord_cols), c["id_col"], "left"
        )
