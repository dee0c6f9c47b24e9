"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Beyond-reference operators (BASELINE.json north star). The container has
no image/audio codecs, so the DECODE step is stubbed (clearly marked),
but everything Spark-side is real and tested: the binary column schema,
the Arrow-batched mapInPandas plumbing, batch shapes, and deterministic
feature extraction.

Design for 100 TB of media:
- content is an opaque BinaryType column; metadata (mime, source, dims)
  is a sibling struct — never parse binary in the JVM row path.
- per-batch work happens in mapInPandas (Arrow transfer, vectorized
  Python); partition sizing via spark.sql.files.maxPartitionBytes keeps
  a batch of blobs within executor memory.
- real decode would slot into `decode_image` (PIL/libvips) without
  touching the pipeline shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic binary stand-in: utf-8 bytes of the text column with
    a typed metadata struct — the schema a real media table would have."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(F.lit("text/plain").alias("mime"), F.lit("fixture").alias("source")).alias("media_meta"),
    )


# probed once at import: a failed import is NOT cached in sys.modules, so
# probing per-row would re-scan sys.path for every blob
try:
    import PIL.Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def decode_image(content: bytes) -> tuple[int, int]:
    """STUB — real decode needs an image codec not present in this
    container. Deterministic fake: dimensions from the first md5 bytes,
    so tests and the SQL oracle can verify the plumbing end to end."""
    if not _HAS_PIL:
        digest = hashlib.md5(content).hexdigest()
        return int(digest[0:2], 16), int(digest[2:4], 16)
    raise NotImplementedError("real image decode not wired; container has no codec fixtures")


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    mapInPandas: one pandas batch in, one out; this is the pattern for
    any decode / resize / frame-sample stage. Python is unavoidable here
    (binary codec work), so the transfer is Arrow and the loop is
    per-batch, never per-row-serialized.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            dims = [decode_image(c) for c in content]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": content.map(len).astype("int64"),
                    "content_md5": content.map(lambda c: hashlib.md5(c).hexdigest()),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
