"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic fake features, or NotImplementedError when strict) — but the
Spark-side plumbing is real and tested: binary columns, explicit schemas,
Arrow-batched ``mapInPandas`` with bounded batch sizes, and metadata
pushdown-friendly layout (metadata columns separate from payload so
filters/projections never touch bytes).

At 100 TB: payloads live in parquet binary columns (or object-store URIs for
>>1 MB assets); ``mapInPandas`` keeps the decode pipeline streaming —
one Arrow batch in flight per task, never a full-partition materialization.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", LongType()),
        StructField("byte_sum_16", LongType()),
    ]
)

BINARY_TABLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def to_binary_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Wrap a text corpus as a binary-payload media table (the test-data
    stand-in for real image/audio payloads)."""
    content = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit("text/plain").alias("media_type"),
        content.alias("content"),
        F.length(content).cast("long").alias("n_bytes"),
    )


def decode_media(binary_df: DataFrame, strict: bool = False) -> DataFrame:
    """The decode/feature-extract stage: ``mapInPandas`` over Arrow batches.

    STUB: real decoders (PIL/libav/...) are not in this container. With
    ``strict=True`` this raises NotImplementedError (the production wiring
    point); otherwise it emits deterministic fake features (payload length,
    first byte, sum of the first 16 bytes) so the batching, schema, and
    partition behavior are real and testable.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media decode requires codec libraries not present in "
                    "this container; plug the real decoder in here"
                )
            payloads = pdf["content"]
            # NULL payloads (e.g. encode of a NULL text) surface as NULL
            # features rather than crashing the Arrow batch — undecodable
            # rows must stay visible downstream, not abort the job. The
            # nullable Int64 dtype carries the NULLs through Arrow.
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(
                        lambda b: None if b is None else len(b)
                    ).astype("Int64"),
                    "first_byte": payloads.map(
                        lambda b: None
                        if b is None
                        else (int(b[0]) if len(b) else -1)
                    ).astype("Int64"),
                    "byte_sum_16": payloads.map(
                        lambda b: None if b is None else int(sum(b[:16]))
                    ).astype("Int64"),
                }
            )

    return binary_df.mapInPandas(decode_batches, DECODED_SCHEMA)


def frame_sample(binary_df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' plumbing demo: slice payloads at fixed strides
    (stands in for video frame extraction — same batch/slice shape)."""

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                if content is None:
                    continue  # no payload -> no frames (not a crash)
                for off in range(0, len(content), every_n_bytes):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_no": off // every_n_bytes,
                            "frame_byte": int(content[off]),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "frame_byte"]
            ).astype({"doc_id": "int64", "frame_no": "int64", "frame_byte": "int64"})

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_no", LongType()),
            StructField("frame_byte", LongType()),
        ]
    )
    return binary_df.mapInPandas(sample_batches, schema)
