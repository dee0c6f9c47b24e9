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
        out = (
            df.drop(c["text_col"])
            .join(surv.select(c["id_col"], "kept_chunks", "new_text"), c["id_col"])
            .withColumnRenamed("new_text", c["text_col"])
        )
        if c["drop_empty"]:
            out = out.filter(F.col("kept_chunks") > 0)
        return out.drop("kept_chunks")


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
