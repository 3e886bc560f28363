"""Multimodal column conventions and decode/transform plumbing.

Convention: media travels as an opaque `binary` payload column plus a
typed metadata struct — the schema a 100 TB training-data lake uses
so Parquet can columnar-skip payloads when only metadata is queried.

The Spark-side plumbing (schemas, Arrow-batched mapInPandas
transforms, partition behavior) is real and tested; the actual codec
calls are STUBBED deterministically because no image/audio libraries
exist in this container:

  * `decode_media(..., real=True)` raises NotImplementedError at the
    exact seam where PIL/ffmpeg would be called;
  * the default fake decoder derives stable pseudo-metadata from the
    payload bytes (md5-seeded), so tests pin the full pipeline shape
    end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("content_digest", T.StringType()),
    ]
)


def attach_fake_payload(
    df: DataFrame, id_col: str, text_col: str = "text", mime: str = "image/png"
) -> DataFrame:
    """Build a media table from any source column: payload = utf-8
    bytes (stand-in for real image bytes), metadata computed
    JVM-side."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.lit(mime).alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for a codec: dimensions derived from
    the content digest. Replace with PIL.Image.open when available."""
    digest = hashlib.md5(payload).hexdigest()
    width = 64 + int(digest[:4], 16) % 1984  # 64..2047
    height = 64 + int(digest[4:8], 16) % 1984
    channels = 1 + int(digest[8], 16) % 4
    return width, height, channels, digest


def decode_media(df: DataFrame, real: bool = False) -> DataFrame:
    """Arrow-batched decode: mapInPandas so each task decodes a
    columnar batch of payloads without JVM round-trips per row. The
    output drops the payload column — downstream metadata queries
    never re-read the bytes."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            if real:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg (unavailable "
                    "in this environment); wire the codec in here"
                )
            meta = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "n_channels": [m[2] for m in meta],
                    "content_digest": [m[3] for m in meta],
                }
            )

    return df.mapInPandas(batches, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_media(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize stub: scales the fake dimensions, passes payload
    through (a real impl transcodes in the same batch loop)."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            meta = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            scale = [max(1.0, max(m[0], m[1]) / max_side) for m in meta]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [int(m[0] / s) for m, s in zip(meta, scale)],
                    "height": [int(m[1] / s) for m, s in zip(meta, scale)],
                    "payload": pdf["payload"],
                }
            )

    return df.mapInPandas(batches, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_digest", T.StringType()),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling stub (video analog): expands each payload into
    k deterministic 'frames' — exercises the 1→N mapInPandas shape a
    real frame sampler has."""

    def batches(it):
        import pandas as pd

        out_ids, out_idx, out_digest = [], [], []
        for pdf in it:
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                n_frames = max(1, len(b) // (every_n * 10))
                for i in range(n_frames):
                    out_ids.append(mid)
                    out_idx.append(i)
                    # ASCII index suffix: reproducible in any engine
                    # with md5 + string concat (the oracle's twin)
                    out_digest.append(
                        hashlib.md5(b + str(i).encode()).hexdigest()
                    )
        import pandas as pd

        yield pd.DataFrame(
            {
                "media_id": out_ids,
                "frame_index": out_idx,
                "frame_digest": out_digest,
            }
        )

    return df.mapInPandas(batches, FRAMES_SCHEMA)


from wilayah_aceh_etl_spark.serde import pickle_module_by_value

pickle_module_by_value(__name__)  # UDF closures must not need repo on worker path


CHUNKED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("chunk_index", T.IntegerType()),
        T.StructField("chunk_n_bytes", T.LongType()),
        T.StructField("chunk_digest", T.StringType()),
    ]
)


def chunk_payload(df: DataFrame, chunk_bytes: int = 1000) -> DataFrame:
    """Fixed-size payload chunking (audio analog: a real pipeline
    windows PCM/opus streams into decoder-sized pieces). 1→N
    mapInPandas expansion like sample_frames; each chunk carries its
    byte length and content digest so reassembly is verifiable.
    Chunk boundaries depend only on payload length — the partition a
    row lands in never changes the output."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            out_ids, out_idx, out_len, out_digest = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                n_chunks = (len(b) + chunk_bytes - 1) // chunk_bytes
                for i in range(n_chunks):
                    c = b[i * chunk_bytes : (i + 1) * chunk_bytes]
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_len.append(len(c))
                    out_digest.append(hashlib.md5(c).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": out_ids,
                    "chunk_index": out_idx,
                    "chunk_n_bytes": out_len,
                    "chunk_digest": out_digest,
                }
            )

    return df.mapInPandas(batches, CHUNKED_SCHEMA)


def chunk_payload_arrow(df: DataFrame, chunk_bytes: int = 1000) -> DataFrame:
    """chunk_payload's twin on the mapInArrow surface: the UDF
    receives pyarrow.RecordBatch directly — no pandas materialization,
    no copy out of Arrow memory — which is the right interface when
    the payload column dominates the batch (media bytes) and the
    Python side only slices it. Output contract is identical to
    chunk_payload and both are held to the same oracle."""

    def batches(it):
        import pyarrow as pa

        for batch in it:
            mids = batch.column("media_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            out_ids, out_idx, out_len, out_digest = [], [], [], []
            for mid, p in zip(mids, payloads):
                b = bytes(p)
                n_chunks = (len(b) + chunk_bytes - 1) // chunk_bytes
                for i in range(n_chunks):
                    c = b[i * chunk_bytes : (i + 1) * chunk_bytes]
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_len.append(len(c))
                    out_digest.append(hashlib.md5(c).hexdigest())
            yield pa.RecordBatch.from_pydict(
                {
                    "media_id": out_ids,
                    "chunk_index": out_idx,
                    "chunk_n_bytes": out_len,
                    "chunk_digest": out_digest,
                },
                schema=pa.schema(
                    [
                        ("media_id", pa.int64()),
                        ("chunk_index", pa.int32()),
                        ("chunk_n_bytes", pa.int64()),
                        ("chunk_digest", pa.string()),
                    ]
                ),
            )

    return df.mapInArrow(batches, CHUNKED_SCHEMA)
