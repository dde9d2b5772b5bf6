"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
struct of metadata next to them. Decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` — the only sanctioned Python-in-the-loop
path, because codecs don't exist as Column expressions. The Spark-side
plumbing (schemas, batching, partition sizing) is real and tested; the
codec itself is pluggable and STUBBED here (no image/audio libs in this
environment) behind ``decoder=`` callables — the default is a
deterministic fake so pipelines are testable end-to-end.

At 100 TB: binary payloads dominate partition size — repartition by
bytes (``target_partition_mb``) before a decode pass so an Arrow batch
of decoded frames fits executor memory.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metadata struct carried beside every media column
MEDIA_META_SCHEMA = (
    "struct<media_type:string,byte_len:bigint,sha1:string>"
)


def attach_media_meta(df: DataFrame, binary_col: str, media_type: str) -> DataFrame:
    """Typed metadata derived JVM-side (no Python): length + sha1 +
    declared media type."""
    b = F.col(binary_col)
    return df.withColumn(
        binary_col + "_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(b).cast("bigint").alias("byte_len"),
            F.sha1(b).alias("sha1"),
        ),
    )


def fake_image_decoder(payload: bytes) -> dict[str, Any]:
    """Deterministic stand-in for a real image decode (PIL/opencv not
    available here): derives pseudo width/height/channels from payload
    bytes. Replace with a real codec in production — the pipeline shape
    does not change."""
    n = len(payload)
    return {
        "width": 64 + (n % 512),
        "height": 64 + ((n // 7) % 512),
        "channels": 3,
        "ok": True,
    }


def decode_images(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    decoder: Callable[[bytes], dict[str, Any]] | None = None,
    batch_rows: int = 256,
) -> DataFrame:
    """Arrow-batched decode pass: mapInPandas with a bounded batch size so
    decoded frames never blow the executor heap.

    Output: (id, width, height, channels, ok). A real decoder returning
    pixel tensors would add a ``binary``/``array<float>`` feature column —
    same plumbing.
    """
    decoder = decoder or fake_image_decoder
    out_schema = f"{id_col} bigint, width int, height int, channels int, ok boolean"

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                recs = []
                for mid, payload in zip(chunk[id_col], chunk[binary_col]):
                    meta = decoder(bytes(payload) if payload is not None else b"")
                    recs.append(
                        {
                            id_col: mid,
                            "width": meta["width"],
                            "height": meta["height"],
                            "channels": meta["channels"],
                            "ok": meta["ok"],
                        }
                    )
                yield pd.DataFrame.from_records(recs)

    return df.select(id_col, binary_col).mapInPandas(_decode, schema=out_schema)


def frame_sample_plan(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    every_n: int = 30,
) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_idx) rows for a
    downstream decode — the fan-out is JVM-side (sequence+explode sized
    from metadata), only the per-frame decode would be Python.

    Frame count is derived deterministically from byte length here (real
    containers carry it in metadata); STUB decode applies as above.
    """
    n_frames = (F.length(F.col(binary_col)) / 1024 + 1).cast("int")
    return df.select(
        id_col,
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


def resize_images(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    target: tuple[int, int] = (224, 224),
) -> DataFrame:
    """Resize stub: raises by design — no imaging libs in this container.
    The signature + schema are the real contract; swap the body for
    PIL/opencv in production."""
    raise NotImplementedError(
        "image resize requires an imaging library not present in this "
        "environment; use decode_images(decoder=...) with a real codec"
    )
