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


def decode_image(content: bytes) -> tuple[int, int]:
    """STUB — real decode needs image fixtures this container lacks.
    Deterministic fake: dimensions from the first md5 bytes, so tests
    and the SQL oracle verify the plumbing end to end. Always the fake,
    even when Pillow happens to be importable: the payloads here are
    utf-8 text stand-ins that PIL.Image.open would reject, and an
    environment-dependent code path would make results (and oracle
    parity) depend on the host's installed packages. Wiring a real
    decoder is an explicit swap of this function's body, not an
    import-probe side effect."""
    digest = hashlib.md5(content).hexdigest()
    return int(digest[0:2], 16), int(digest[2:4], 16)


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


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("new_width", T.IntegerType()),
        T.StructField("new_height", T.IntegerType()),
    ]
)


def resize_dims(w: int, h: int, max_dim: int) -> tuple[int, int]:
    """Fit (w, h) inside a max_dim square preserving aspect ratio —
    floor semantics, never below 1. Pure so the SQL oracle can repeat
    the arithmetic exactly."""
    scale = min(1.0, max_dim / max(w, h, 1))
    return max(1, int(w * scale)), max(1, int(h * scale))


def resize_images(media: DataFrame, max_dim: int = 64) -> DataFrame:
    """Resize stage: decode -> scale-to-fit -> re-encode, as mapInPandas.

    The pixel transform is STUBBED (content passes through — a real
    implementation re-encodes via PIL.Image.thumbnail in the same loop);
    the dimension arithmetic, batch shape, and 1-to-1 row contract are
    real. Runs where the blobs already are: no shuffle, pure map stage.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode_image(c) for c in pdf["content"]]
            new_dims = [resize_dims(w, h, max_dim) for w, h in dims]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": pdf["content"],  # stub: real impl re-encodes scaled pixels
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "new_width": [d[0] for d in new_dims],
                    "new_height": [d[1] for d in new_dims],
                }
            )

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.LongType()),
        T.StructField("n_frame_bytes", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 256, stride: int = 4, max_frames: int = 8
) -> DataFrame:
    """Frame sampling: one input blob -> up to max_frames frame rows
    (every stride-th frame) — the 1-to-many mapInPandas shape every
    video pipeline needs.

    The demux/decode is STUBBED: fixed-size byte chunks stand in for
    decoded frames (a real implementation demuxes via pyav in the same
    per-batch loop). The fan-out contract, batch shapes, and frame
    accounting are real: at 100 TB the stage is map-only — sampled
    frames are emitted where the video bytes already live, and the
    output is ~max_frames/stride of the input size, never a shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_len, out_md5 = [], [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                n_total = -(-len(content) // frame_bytes)  # ceil
                for idx in list(range(0, n_total, stride))[:max_frames]:
                    chunk = content[idx * frame_bytes : (idx + 1) * frame_bytes]
                    out_doc.append(doc_id)
                    out_idx.append(idx)
                    out_len.append(len(chunk))
                    out_md5.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "frame_index": pd.Series(out_idx, dtype="int64"),
                    "n_frame_bytes": pd.Series(out_len, dtype="int64"),
                    "frame_md5": pd.Series(out_md5, dtype="object"),
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC): gear-hash boundaries over binary payloads
# — the dedup primitive for byte streams where fixed-size blocks break on
# insertion (a 1-byte prefix shift re-keys every fixed block, but CDC
# boundaries depend only on LOCAL content, so chunks resynchronize).
# Reference-class analogue: FastCDC/LBFS-style chunking used by every
# content-addressed store; here as a 1-to-many mapInPandas over the same
# media frame the other multimodal stages use.
# ---------------------------------------------------------------------------

import hashlib as _hashlib

CHUNK_SCHEMA = "doc_id long, chunk_no int, offset long, length int, chunk_md5 string"

_GEAR_MASK64 = (1 << 64) - 1


def _gear_table() -> list[int]:
    """256 deterministic 64-bit gear values: md5(byte index) — fixed
    across runs/machines, so chunk boundaries are reproducible."""
    return [
        int.from_bytes(_hashlib.md5(bytes([i])).digest()[:8], "big") for i in range(256)
    ]


def cdc_boundaries(
    data: bytes, gear: list[int], min_size: int, avg_bits: int, max_size: int
) -> list[tuple[int, int]]:
    """(offset, length) chunk list for one payload. Boundary when the
    rolling gear hash has `avg_bits` low zero bits (expected chunk size
    2^avg_bits) and the chunk has at least min_size bytes; max_size is a
    hard cap. Pure function -> unit-testable without Spark."""
    chunks = []
    start = 0
    h = 0
    mask = (1 << avg_bits) - 1
    for i, b in enumerate(data):
        h = ((h << 1) + gear[b]) & _GEAR_MASK64
        size = i - start + 1
        if (size >= min_size and (h & mask) == 0) or size >= max_size:
            chunks.append((start, size))
            start = i + 1
            h = 0
    if start < len(data):
        chunks.append((start, len(data) - start))
    return chunks


def cdc_chunks(
    media: DataFrame,
    min_size: int = 64,
    avg_bits: int = 8,
    max_size: int = 1024,
) -> DataFrame:
    """Explode each binary payload into content-defined chunks with
    content hashes: (doc_id, chunk_no, offset, length, chunk_md5).
    Downstream exact-dedup on chunk_md5 dedups shared REGIONS across
    documents, not just identical whole files. Arrow-batched, 1-to-many;
    the gear table is built once per python worker, not per row."""
    gear = _gear_table()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "chunk_no": [], "offset": [], "length": [], "chunk_md5": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                data = bytes(content)
                for no, (off, ln) in enumerate(
                    cdc_boundaries(data, gear, min_size, avg_bits, max_size)
                ):
                    out["doc_id"].append(doc_id)
                    out["chunk_no"].append(no)
                    out["offset"].append(off)
                    out["length"].append(ln)
                    out["chunk_md5"].append(_hashlib.md5(data[off : off + ln]).hexdigest())
            yield pd.DataFrame(out)

    return media.select("doc_id", "content").mapInPandas(run, schema=CHUNK_SCHEMA)


ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame", T.LongType()),
        T.StructField("energy", T.DoubleType()),
    ]
)


def decode_audio(content: bytes):
    """STUB — real decode needs an audio codec not present in this
    container. Deterministic fake: the payload bytes read as unsigned
    8-bit PCM centered at 128, so tests and the SQL oracle can verify
    the plumbing (framing, energy math, segmentation) end to end."""
    import numpy as np

    return np.frombuffer(content, dtype=np.uint8).astype(np.float64) - 128.0


def frame_energies(media: DataFrame, frame_len: int = 64) -> DataFrame:
    """Per-frame RMS^2 energy over binary audio content — the decode
    stage of a VAD/silence pipeline. Arrow-batched mapInPandas (binary
    codec work is the documented Python-unavoidable case); one input
    batch yields all full frames of its blobs, the ragged tail is
    dropped (a real codec pads instead). Energies are exact integers in
    double (sums of int squares / power-of-two), so downstream
    comparisons are engine-portable with no float-order hazard."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, energies = [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                s = decode_audio(content)
                n = len(s) // frame_len
                if n == 0:
                    continue
                e = (s[: n * frame_len] ** 2).reshape(n, frame_len).mean(axis=1)
                ids.extend([doc_id] * n)
                frames.extend(range(n))
                energies.extend(e)
            yield pd.DataFrame({"doc_id": ids, "frame": frames, "energy": energies})

    return media.mapInPandas(run, schema=ENERGY_SCHEMA)


def silence_segments(energies: DataFrame, threshold: float) -> DataFrame:
    """Merge consecutive below-threshold frames into maximal silence
    segments — relational gap-and-islands over the energy frame table
    (everything after the decode stays JVM-side): one window per doc,
    then a groupBy. Returns (doc_id, seg_start, seg_end, n_frames)."""
    from pyspark.sql import Window

    sil = energies.filter(F.col("energy") < threshold)
    w = Window.partitionBy("doc_id").orderBy("frame")
    isl = sil.withColumn("g", F.col("frame") - F.row_number().over(w))
    return isl.groupBy("doc_id", "g").agg(
        F.min("frame").alias("seg_start"),
        F.max("frame").alias("seg_end"),
        F.count("*").alias("n_frames"),
    ).drop("g")


LUMA_SCHEMA = "doc_id long, frame long, luma double"


def frame_lumas(media: DataFrame, frame_len: int = 64) -> DataFrame:
    """Per-frame mean byte value ("luma proxy") over binary video
    content — the decode stage of a scene-cut pipeline. Same stubbed
    codec contract as frame_energies (a real build swaps pyav into the
    same per-batch loop): Arrow-batched mapInPandas, full frames only.
    Lumas are integer sums over a power-of-two frame, exact in double,
    so the boundary comparisons downstream are engine-portable."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, lumas = [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                s = np.frombuffer(bytes(content), dtype=np.uint8).astype(np.float64)
                n = len(s) // frame_len
                if n == 0:
                    continue
                m = s[: n * frame_len].reshape(n, frame_len).mean(axis=1)
                ids.extend([doc_id] * n)
                frames.extend(range(n))
                lumas.extend(m)
            yield pd.DataFrame({"doc_id": ids, "frame": frames, "luma": lumas})

    return media.mapInPandas(run, schema=LUMA_SCHEMA)


def scene_segments(lumas: DataFrame, threshold: float) -> DataFrame:
    """Scene-cut segmentation: a boundary wherever the frame-to-frame
    luma jump exceeds `threshold`; consecutive frames between
    boundaries form one scene. Relational after the decode: one lag +
    one running-sum window per doc (scene_no = cumulative boundary
    count), then a groupBy. Returns
    (doc_id, scene_no, start_frame, end_frame, n_frames)."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("frame")
    cut = F.when(
        F.abs(F.col("luma") - F.lag("luma").over(w)) > threshold, 1
    ).otherwise(0)
    scened = lumas.withColumn("scene_no", F.sum(cut).over(w).cast("long"))
    return scened.groupBy("doc_id", "scene_no").agg(
        F.min("frame").alias("start_frame"),
        F.max("frame").alias("end_frame"),
        F.count("*").cast("long").alias("n_frames"),
    )


AHASH_SCHEMA = "doc_id long, ahash long"


def image_ahash(media: DataFrame, tile_len: int = 8, n_tiles: int = 16) -> DataFrame:
    """Perceptual average-hash over binary image content: the first
    n_tiles·tile_len bytes stand in for a decoded pixel grid (stubbed
    codec, same contract as the audio/video decodes — a real build
    resizes to a tile grid with PIL in this loop); bit i of the hash is
    set when tile i's mean byte exceeds the global mean. Blobs shorter
    than one grid are skipped (a real codec letterboxes).

    Tile means are exact eighths and the grand mean an exact 128th in
    double, so the strict > comparison — and therefore the hash — is
    engine-portable bit-for-bit."""
    import numpy as np

    grid = tile_len * n_tiles

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                raw = bytes(content)
                if len(raw) < grid:
                    continue
                s = np.frombuffer(raw[:grid], dtype=np.uint8).astype(np.float64)
                tm = s.reshape(n_tiles, tile_len).mean(axis=1)
                g = tm.mean()
                h = 0
                for i, m in enumerate(tm):
                    if m > g:
                        h |= 1 << i
                ids.append(doc_id)
                hashes.append(h)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"), "ahash": pd.Series(hashes, dtype="int64")}
            )

    return media.mapInPandas(run, schema=AHASH_SCHEMA)
