"""Multimodal column conventions and decode/transform plumbing.

Convention: media travels as an opaque `binary` payload column plus a
typed metadata struct — the schema a 100 TB training-data lake uses
so Parquet can columnar-skip payloads when only metadata is queried.

THE CODEC MATRIX IS FINAL (round 7). Every architecture class an
analytics engine needs to prove its media plumbing is covered and
oracle-proven below — block-transform (JPEG baseline/progressive/SA,
gray+color, 4:2:0), subband (Haar), palette+LZW (GIF incl. animated),
companding (μ-law), adaptive differential (ADPCM), motion-compensated
inter-frame (MC video), lossless raster (PNG/BMP), PCM (WAV). The
remaining seams (arithmetic coding, mp3/ogg entropy layers, h264) are
environment-bound and add no analytics capability; no further codec
work is planned or needed — new effort goes to query/scale surface.

What is REAL here (pure Python, no image/audio libraries needed,
proven through DuckDB oracle gates):

  * PNG: full encode (`make_png`/`encode_png_pixels`) and full pixel
    DECODE through all five spec scanline filters
    (`decode_png_pixels`), nearest-neighbor resize, header parse;
  * container header parse for PNG/JPEG/GIF/BMP
    (`parse_image_header`) — dimensions + channel count from the
    actual bytes, bounds-checked so truncated streams return None;
  * WAV: PCM encode (`make_wav`) and full sample decode
    (`decode_wav_samples`) via a RIFF chunk walk — 8/16-bit,
    multi-channel;
  * BMP: 24-bit encode + pixel decode (`decode_bmp_pixels`) with
    bottom-up/top-down row handling and stride padding;
  * GIF: encode + pixel decode (`decode_gif_pixels`) through a
    REAL LZW decompressor (`_lzw_decode` — variable code width,
    table growth, clear/end, KwKwK), including ANIMATED multi-frame
    streams (`make_gif_animated`/`decode_gif_frames`) — so frame
    sampling (`sample_gif_frames`) runs on genuinely decoded
    frames, the video-analog path;
  * JPEG: baseline GRAYSCALE and 4:4:4 COLOR encode
    (`make_jpeg_gray`/`make_jpeg_ycbcr`) and full pixel DECODE
    (`decode_jpeg_gray_pixels`/`decode_jpeg_ycbcr_pixels`) —
    FDCT/IDCT, quantization, zigzag, DC differential prediction
    (one chain per component), canonical Huffman coding with the
    luminance AND chroma tables rebuilt from the file's own DHT
    segments, 0xFF byte stuffing, and DRI/RSTn restart intervals
    (byte realignment + all-predictor reset — the parallel-decode
    seam, segment independence test-pinned);
  * G.711 μ-law companding (`mulaw_encode`/`mulaw_decode`) — a real
    standardized LOSSY audio codec whose integer arithmetic makes
    even its loss oracle-exact;
  * payload chunking, frame sampling, Arrow-batched mapInPandas
    plumbing, the binary+metadata column convention.

What is SEAMED (returns None / raises NotImplementedError at the
exact call site a real codec would plug into, because PIL/ffmpeg are
not in this container): arithmetic-coded JPEG and chroma-subsampled
progressive (baseline
grayscale, 4:4:4 color, 4:2:0 chroma-subsampled —
`make_jpeg_ycbcr_420`/`decode_jpeg_ycbcr420_pixels`, the
camera-JPEG MCU geometry — PROGRESSIVE grayscale in BOTH
dimensions: spectral selection (`make_jpeg_gray_progressive`, SOF2
DC + banded AC scans, general EOBn) and successive approximation
(`make_jpeg_gray_progressive_sa`, the 4-scan Al=1→refine script
with G.1.2.3 correction-bit coding), one decoder
(`decode_jpeg_gray_progressive`) covering both — and
MULTI-COMPONENT progressive 4:4:4 color in BOTH dimensions
(`make_jpeg_ycbcr_progressive` spectral selection and
`make_jpeg_ycbcr_progressive_sa` the 8-scan successive-approximation
script — interleaved DC scans, per-component non-interleaved AC
scans — one decoder `decode_jpeg_ycbcr_progressive` covering both)
— all REAL),
perceptual transform-audio (mp3/ogg entropy layers; μ-law covers
companding, the Haar subband codec covers the subband-transform
class), and h264-class inter-frame video — though `video_mc_encode`/
`video_mc_decode` implement the real I/P motion-compensation
architecture (SAD search, closed-loop prediction, quantized
residuals) and animated GIF covers multi-frame decode.
`decode_media(..., real=False)` keeps an md5-seeded
deterministic fake for pipeline-shape tests of those paths.
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


# PNG color type → samples per pixel (PNG spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG SOFn markers that carry frame dimensions (all except DHT/DAC)
_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def parse_image_header(payload: bytes) -> tuple[int, int, int] | None:
    """(width, height, n_channels) from real image bytes — pure-Python
    container-header parse, no codec library needed. Handles the four
    formats that cover the overwhelming majority of web-crawl media:

      PNG  — IHDR chunk is mandatory-first (spec §5.6): width/height
             big-endian u32 at offsets 16/20, channels from color type.
      JPEG — walk marker segments to the first SOFn frame header:
             height/width big-endian u16 at +5/+7, components at +9.
      GIF  — logical screen descriptor: width/height LE u16 at 6/8.
      BMP  — BITMAPINFOHEADER: width/height LE i32 at 18/22.

    Returns None for anything else (the seam where a full codec —
    pixel decode, EXIF rotation, CMYK JPEGs — would plug in)."""
    import struct

    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        if payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            color_type = payload[25] if len(payload) > 25 else 0
            return int(w), int(h), _PNG_CHANNELS.get(color_type, 1)
        return None
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 1 < len(payload):
            if payload[i] != 0xFF:
                return None  # desynced — not a marker where expected
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            # every slice below is bounds-checked first: a truncated
            # or corrupt stream must hit the documented None seam,
            # never raise struct.error from inside an executor task
            if i + 4 > len(payload):
                return None  # length bytes of a sized marker cut off
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF:
                if i + 10 > len(payload):
                    return None  # SOF dimensions truncated
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return int(w), int(h), int(payload[i + 9])
            i += 2 + seg_len
        return None
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return int(w), int(h), 3
    if len(payload) >= 26 and payload[:2] == b"BM":
        w, h = struct.unpack("<ii", payload[18:26])
        return int(w), abs(int(h)), 3  # negative height = top-down rows
    return None


def decode_media(df: DataFrame, real: bool = False) -> DataFrame:
    """Arrow-batched decode: mapInPandas so each task decodes a
    columnar batch of payloads without JVM round-trips per row. The
    output drops the payload column — downstream metadata queries
    never re-read the bytes.

    real=True parses the actual container headers (PNG/JPEG/GIF/BMP,
    pure Python — see parse_image_header); a payload in any other
    format raises NotImplementedError at the codec seam. real=False
    keeps the md5-seeded deterministic fake for pipeline-shape tests."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            meta = []
            for p in pdf["payload"]:
                b = bytes(p)
                if real:
                    parsed = parse_image_header(b)
                    if parsed is None:
                        raise NotImplementedError(
                            "payload is not PNG/JPEG/GIF/BMP; full pixel "
                            "decode requires PIL/ffmpeg (unavailable in "
                            "this environment); wire the codec in here"
                        )
                    meta.append((*parsed, hashlib.md5(b).hexdigest()))
                else:
                    meta.append(_fake_decode(b))
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


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import binascii
    import struct

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", binascii.crc32(tag + data) & 0xFFFFFFFF)
    )


def make_png(width: int, height: int, gray: int = 128) -> bytes:
    """A genuine, spec-valid grayscale PNG built with stdlib only
    (struct + zlib + binascii.crc32): signature, IHDR, one IDAT of
    filter-0 scanlines, IEND. Used to feed REAL image bytes through
    the decode path in environments without image libraries."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = (b"\x00" + bytes([gray % 256]) * width) * height
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


# PNG scanline filter ids (spec §9): None, Sub, Up, Average, Paeth
_PNG_FILTERS = (0, 1, 2, 3, 4)


def encode_png_pixels(
    pixels: bytes, width: int, height: int, channels: int = 1,
    filter_type: int = 0,
) -> bytes:
    """Encode raw 8-bit pixels (row-major, `channels` samples per
    pixel: 1=gray, 2=gray+alpha, 3=RGB, 4=RGBA) as a spec-valid PNG,
    applying the SAME scanline filter to every row. Exists so the
    decoder's un-filtering of all five filter types can be
    property-tested against a known pixel buffer."""
    import struct
    import zlib

    if filter_type not in _PNG_FILTERS:
        raise ValueError(f"bad filter {filter_type}")
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    assert len(pixels) == stride * height
    out = bytearray()
    prev = bytes(stride)
    for r in range(height):
        row = pixels[r * stride : (r + 1) * stride]
        out.append(filter_type)
        for i in range(stride):
            x = row[i]
            a = row[i - channels] if i >= channels else 0  # left
            b = prev[i]  # up
            c = prev[i - channels] if i >= channels else 0  # up-left
            if filter_type == 0:
                f = x
            elif filter_type == 1:
                f = (x - a) & 0xFF
            elif filter_type == 2:
                f = (x - b) & 0xFF
            elif filter_type == 3:
                f = (x - (a + b) // 2) & 0xFF
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                f = (x - pred) & 0xFF
            out.append(f)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """FULL pixel decode of a PNG in pure Python: chunk walk → IDAT
    concat → zlib inflate → per-scanline UN-filtering of all five
    spec filters (None/Sub/Up/Average/Paeth). Supports the common
    web case — 8-bit depth, color types 0/2/4/6 (gray, RGB,
    gray+alpha, RGBA), no interlace — and raises NotImplementedError
    at the seam for palette/16-bit/Adam7 (where a full codec library
    would take over). Returns (width, height, channels, raw pixels
    row-major)."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError("not a PNG")
    pos, idat, meta = 8, bytearray(), None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            meta = (w, h, depth, color, interlace)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if meta is None:
        raise NotImplementedError("PNG without IHDR")
    w, h, depth, color, interlace = meta
    channels = _PNG_CHANNELS.get(color)
    if depth != 8 or interlace != 0 or color == 3 or channels is None:
        raise NotImplementedError(
            "pure-Python PNG decode covers 8-bit non-interlaced "
            "gray/RGB/+alpha; palette/16-bit/Adam7 need a codec library"
        )
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != (stride + 1) * h:
        raise NotImplementedError("unexpected PNG data length")
    out = bytearray(stride * h)
    prev = bytes(stride)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        row = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for i in range(channels, stride):
                row[i] = (row[i] + row[i - channels]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                row[i] = (row[i] + (a + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ft != 0:
            raise NotImplementedError(f"PNG filter {ft}")
        out[r * stride : (r + 1) * stride] = row
        prev = bytes(row)
    return w, h, channels, bytes(out)


def attach_png_payload(
    df: DataFrame, id_col: str, max_side: int = 64
) -> DataFrame:
    """Media table whose payloads are REAL PNG bytes: dimensions are
    a deterministic function of the id (width = 1 + id % max_side,
    height = 1 + (id * 7) % max_side, gray = id % 256), so an oracle
    can predict the decoded metadata without parsing PNGs itself.
    Built in mapInPandas — payload synthesis is the stand-in for the
    fetch/read stage of a real crawl pipeline."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            ids = [int(v) for v in pdf["_mid"]]
            payloads = [
                make_png(1 + i % max_side, 1 + (i * 7) % max_side, i % 256)
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": payloads,
                    "mime": ["image/png"] * len(ids),
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return df.select(F.col(id_col).cast("long").alias("_mid")).mapInPandas(
        batches, MEDIA_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_media(
    df: DataFrame, max_side: int = 256, real: bool = False
) -> DataFrame:
    """Resize in the Arrow batch loop. real=True performs an ACTUAL
    nearest-neighbor resample: pure-Python PNG pixel decode →
    index-sampled rows/columns → PNG re-encode (stdlib zlib). The
    default stub path scales the fake dimensions and passes payload
    through — kept for pipeline-shape tests on non-PNG payloads."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            ids, ws, hs, payloads = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                if real:
                    w, h, ch, px = decode_png_pixels(b)
                    s = max(1.0, max(w, h) / max_side)
                    nw, nh = max(1, int(w / s)), max(1, int(h / s))
                    stride = w * ch
                    out = bytearray(nw * nh * ch)
                    for r in range(nh):
                        sr = min(h - 1, int(r * s))
                        for c in range(nw):
                            sc = min(w - 1, int(c * s))
                            o = (r * nw + c) * ch
                            i = sr * stride + sc * ch
                            out[o : o + ch] = px[i : i + ch]
                    ids.append(mid)
                    ws.append(nw)
                    hs.append(nh)
                    payloads.append(
                        encode_png_pixels(bytes(out), nw, nh, ch)
                    )
                else:
                    m = _fake_decode(b)
                    s = max(1.0, max(m[0], m[1]) / max_side)
                    ids.append(mid)
                    ws.append(int(m[0] / s))
                    hs.append(int(m[1] / s))
                    payloads.append(b)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": ws,
                    "height": hs,
                    "payload": payloads,
                }
            )

    return df.mapInPandas(batches, RESIZED_SCHEMA)


PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("min_intensity", T.IntegerType()),
        T.StructField("max_intensity", T.IntegerType()),
    ]
)


def png_pixel_stats(df: DataFrame) -> DataFrame:
    """Feature extraction through the FULL pixel decode: per media,
    the intensity profile of the first channel. This is the operator
    shape of any image featurizer (decode → per-pixel reduce) with
    the decode genuinely executed — not header-only, not faked."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, px = decode_png_pixels(bytes(p))
                first = px[::ch] if ch > 1 else px
                n = w * h
                rows.append(
                    (
                        mid,
                        w,
                        h,
                        n,
                        round(sum(first) / n, 4),
                        min(first),
                        max(first),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "n_pixels",
                    "mean_intensity",
                    "min_intensity",
                    "max_intensity",
                ],
            )

    return df.mapInPandas(batches, PIXEL_STATS_SCHEMA)


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


# ---------------------------------------------------------------------------
# WAV (RIFF PCM): real pure-Python encode + decode — the audio twin
# of the PNG stack. Same design: payloads are genuine spec-valid
# container bytes, the decoder walks the actual chunk structure, and
# the oracle predicts the decoded SAMPLES from construction
# arithmetic, so a hash match proves real audio bytes round-tripped.
# ---------------------------------------------------------------------------


def make_wav(
    samples: list[int],
    sample_rate: int = 8000,
    n_channels: int = 1,
    bits: int = 16,
) -> bytes:
    """Spec-valid RIFF/WAVE PCM bytes. `samples` is the flat
    interleaved sample stream (frame-major): len must be a multiple
    of n_channels. bits=16 → signed little-endian, bits=8 →
    unsigned (offset-binary), per the WAV spec."""
    import struct

    if len(samples) % n_channels:
        raise ValueError("sample count not a multiple of n_channels")
    if bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 8:
        data = bytes(s & 0xFF for s in samples)
    else:
        raise ValueError("PCM bits must be 8 or 16")
    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH",
        1,  # audio_format = PCM
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav_header(
    payload: bytes,
) -> tuple[int, int, int, int] | None:
    """(sample_rate, n_channels, bits, n_frames) from the RIFF chunk
    walk, or None for non-WAV/truncated/compressed payloads (the
    seam). Unknown chunks (LIST, fact, ...) are skipped by their
    declared size — the walk handles real-world WAVs, not just ours.
    Every slice is bounds-checked: malformed bytes return None, they
    never raise from an executor task."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    while i + 8 <= len(payload):
        tag = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + size]
        if tag == b"fmt ":
            if len(body) < 16:
                return None
            audio_format, n_ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_format != 1 or bits not in (8, 16) or n_ch == 0:
                return None  # compressed / exotic PCM → seam
            fmt = (rate, n_ch, bits)
        elif tag == b"data":
            if fmt is None or len(body) < size:
                return None  # data before fmt, or truncated payload
            rate, n_ch, bits = fmt
            n_frames = size // (n_ch * bits // 8)
            if n_frames == 0:
                return None  # empty data chunk: no samples → seam
            return rate, n_ch, bits, n_frames
        i += 8 + size + (size & 1)  # chunks are word-aligned
    return None


def decode_wav_samples(
    payload: bytes,
) -> tuple[int, int, int, list[int]] | None:
    """(sample_rate, n_channels, bits, flat interleaved samples) —
    the full PCM decode. 16-bit → signed ints, 8-bit → unsigned."""
    import struct

    meta = parse_wav_header(payload)
    if meta is None:
        return None
    rate, n_ch, bits, n_frames = meta
    # re-walk to the data chunk body (parse proved it exists intact)
    i = 12
    while True:
        tag = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if tag == b"data":
            body = payload[i + 8 : i + 8 + size]
            break
        i += 8 + size + (size & 1)
    n = n_frames * n_ch
    if bits == 16:
        samples = list(struct.unpack(f"<{n}h", body[: 2 * n]))
    else:
        samples = list(body[:n])
    return rate, n_ch, bits, samples


def attach_wav_payload(df: DataFrame, id_col: str) -> DataFrame:
    """Media table whose payloads are REAL WAV bytes with samples an
    arithmetic function of the id — flat sample k of media m is
    ((m*31 + k*17) % 65536) - 32768 — so a SQL oracle can recompute
    the decoded waveform without parsing RIFF itself. n_frames =
    50 + id%200, stereo for odd ids, 8 kHz/16 kHz by id parity."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            ids = [int(v) for v in pdf["_mid"]]
            rows = []
            for m in ids:
                n_frames = 50 + m % 200
                n_ch = 1 + m % 2
                rate = 8000 if m % 2 == 0 else 16000
                flat = [
                    ((m * 31 + k * 17) % 65536) - 32768
                    for k in range(n_frames * n_ch)
                ]
                p = make_wav(flat, rate, n_ch, 16)
                rows.append((m, p, "audio/wav", len(p)))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "mime", "n_bytes"]
            )

    return df.select(F.col(id_col).cast("long").alias("_mid")).mapInPandas(
        batches, MEDIA_SCHEMA
    )


WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sum_amp", T.LongType()),
        T.StructField("mean_amp", T.DoubleType()),
        T.StructField("min_amp", T.IntegerType()),
        T.StructField("max_amp", T.IntegerType()),
    ]
)


def wav_sample_stats(df: DataFrame) -> DataFrame:
    """Waveform featurization through the FULL PCM decode: per
    media, amplitude profile of channel 0 — the operator shape of
    any audio featurizer (decode → per-sample reduce), with the
    decode genuinely executed on real RIFF bytes."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                decoded = decode_wav_samples(bytes(p))
                if decoded is None:
                    continue  # non-PCM payloads: skip, don't crash
                rate, n_ch, _bits, flat = decoded
                ch0 = flat[::n_ch]
                n = len(ch0)
                s = sum(ch0)
                rows.append(
                    (
                        mid,
                        n,
                        rate,
                        n_ch,
                        s,  # exact integer: the hash-stable statistic
                        round(s / n, 4),
                        min(ch0),
                        max(ch0),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_frames",
                    "sample_rate",
                    "n_channels",
                    "sum_amp",
                    "mean_amp",
                    "min_amp",
                    "max_amp",
                ],
            )

    return df.mapInPandas(batches, WAV_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# BMP: real encode + pixel decode (BITMAPINFOHEADER, 24-bit BGR,
# bottom-up rows, 4-byte row padding — the parts a naive decoder
# gets wrong and stats alone can't catch; corner probes pin the
# row flip).
# ---------------------------------------------------------------------------


def make_bmp(width: int, height: int, blue_of) -> bytes:
    """Spec-valid 24-bit BMP. `blue_of(x, y)` gives the blue channel
    of the pixel at (x, y) in TOP-DOWN coordinates; red/green are 0.
    Rows are stored BOTTOM-UP with 4-byte padding, per the format."""
    import struct

    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up storage
        for x in range(width):
            body += bytes((blue_of(x, y) & 0xFF, 0, 0))  # B, G, R
        body += b"\x00" * pad
    data_off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body),
            2835, 2835, 0, 0,
        )
    )
    return header + bytes(body)


def decode_bmp_pixels(
    payload: bytes,
) -> tuple[int, int, list[int]] | None:
    """(width, height, blue-channel pixels in TOP-DOWN row-major
    order) from a 24-bit uncompressed BMP — handles bottom-up AND
    top-down (negative height) storage and row padding. None for
    other depths/compressions (the seam)."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack("<I", payload[10:14])[0]
    w, h_raw = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    compression = struct.unpack("<I", payload[30:34])[0]
    if bpp != 24 or compression != 0 or planes != 1 or w <= 0:
        return None
    if h_raw == 0:
        return None  # zero-height image: nothing to featurize → seam
    top_down = h_raw < 0
    h = abs(h_raw)
    row_bytes = w * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    if data_off + stride * h > len(payload):
        return None  # truncated
    px = []
    for y in range(h):
        src_y = y if top_down else h - 1 - y
        base = data_off + src_y * stride
        row = payload[base : base + row_bytes]
        px.extend(row[0::3])  # blue channel
    return w, h, px


BMP_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("sum_blue", T.LongType()),
        T.StructField("min_blue", T.IntegerType()),
        T.StructField("max_blue", T.IntegerType()),
        T.StructField("top_left", T.IntegerType()),
        T.StructField("bottom_left", T.IntegerType()),
    ]
)


def attach_bmp_payload(df: DataFrame, id_col: str, max_side: int = 32) -> DataFrame:
    """Media table with REAL BMP bytes: width = 1 + id % max_side,
    height = 1 + (id * 5) % max_side, blue(x, y) = (id + x + 2*y) %
    256 — a gradient, so the corner probes distinguish a correct
    bottom-up un-flip from a naive row order."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for m in (int(v) for v in pdf["_mid"]):
                w = 1 + m % max_side
                h = 1 + (m * 5) % max_side
                p = make_bmp(w, h, lambda x, y, m=m: (m + x + 2 * y) % 256)
                rows.append((m, p, "image/bmp", len(p)))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "mime", "n_bytes"]
            )

    return df.select(F.col(id_col).cast("long").alias("_mid")).mapInPandas(
        batches, MEDIA_SCHEMA
    )


def bmp_pixel_stats(df: DataFrame) -> DataFrame:
    """Featurization through the full BMP decode: blue-channel
    profile plus the (0,0) and (0,h-1) corner probes that pin the
    bottom-up row un-flip."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                decoded = decode_bmp_pixels(bytes(p))
                if decoded is None:
                    continue
                w, h, px = decoded
                rows.append(
                    (
                        mid, w, h, w * h, sum(px), min(px), max(px),
                        px[0], px[(h - 1) * w],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_pixels", "sum_blue",
                    "min_blue", "max_blue", "top_left", "bottom_left",
                ],
            )

    return df.mapInPandas(batches, BMP_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# GIF: real encode + pixel decode. The decoder is a genuine LZW
# decompressor (variable-width codes, clear/end handling, the
# KwKwK case) — not a header skim; the encoder emits spec-valid
# 9-bit-code LZW streams (clear-flush before the table would grow
# past 9 bits, the classic "uncompressed GIF" device).
# ---------------------------------------------------------------------------


def make_gif(width: int, height: int, index_of) -> bytes:
    """Spec-valid GIF89a, 256-entry grayscale global palette
    (palette[i] = (i,i,i)); `index_of(x, y)` gives the palette index
    (= gray value) of the pixel at (x, y) top-down."""
    import struct

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes((0xF7, 0, 0))  # GCT present, 256 entries
    for i in range(256):
        out += bytes((i, i, i))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    out += bytes((8,))  # LZW minimum code size

    # 9-bit literal LZW: CLEAR, ≤254 literals, repeat, END
    CLEAR, END = 256, 257
    codes = []
    pending = 0
    codes.append(CLEAR)
    for y in range(height):
        for x in range(width):
            if pending == 254:
                codes.append(CLEAR)
                pending = 0
            codes.append(index_of(x, y) & 0xFF)
            pending += 1
    codes.append(END)
    # pack codes LSB-first at a fixed 9 bits (valid: the table never
    # reaches 512 between clears, so the width never grows)
    acc = n_bits = 0
    stream = bytearray()
    for c in codes:
        acc |= c << n_bits
        n_bits += 9
        while n_bits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8
    if n_bits:
        stream.append(acc & 0xFF)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out += bytes((len(chunk),)) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int):
    """Generic GIF LZW decode → list of palette indices, or None on
    a corrupt stream. Full algorithm: variable code width, table
    growth to 12 bits, clear/end codes, first-code and KwKwK cases."""
    CLEAR = 1 << min_code_size
    END = CLEAR + 1

    def fresh_table():
        return {i: (i,) for i in range(CLEAR)}

    table = fresh_table()
    next_code = END + 1
    width = min_code_size + 1
    acc = n_bits = pos = 0
    prev = None
    out = []
    while len(out) < n_pixels:
        while n_bits < width:
            if pos >= len(data):
                return None  # truncated stream
            acc |= data[pos] << n_bits
            pos += 1
            n_bits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width
        if code == CLEAR:
            table = fresh_table()
            next_code = END + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == END:
            break
        if prev is None:
            if code not in table:
                return None
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[next_code] = prev + (entry[0],)
            next_code += 1
        elif code == next_code:  # KwKwK
            entry = prev + (prev[0],)
            table[next_code] = entry
            next_code += 1
        else:
            return None  # corrupt: code beyond table
        if next_code == (1 << width) and width < 12:
            width += 1
        out.extend(entry)
        prev = entry
    return out[:n_pixels]


def decode_gif_pixels(
    payload: bytes,
) -> tuple[int, int, list[int]] | None:
    """(width, height, palette-index pixels top-down row-major) of
    the FIRST image in a GIF, via real LZW decode. None for
    interlaced images, local palettes, or malformed streams (the
    seam). With a grayscale palette the indices ARE the gray
    values."""
    import struct

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    flags = payload[10]
    i = 13
    if flags & 0x80:  # global color table
        i += 3 * (2 << (flags & 0x07))
    while i < len(payload):
        b = payload[i]
        if b == 0x21:  # extension: skip sub-blocks
            i += 2
            while i < len(payload) and payload[i] != 0:
                i += 1 + payload[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            if i + 10 > len(payload):
                return None
            w, h = struct.unpack("<HH", payload[i + 5 : i + 9])
            iflags = payload[i + 9]
            if iflags & 0xC0:  # local palette / interlace → seam
                return None
            if w == 0 or h == 0 or w * h > (1 << 22):
                return None  # zero/hostile dims: bound the decode
            i += 10
            if i >= len(payload):
                return None
            min_code = payload[i]
            i += 1
            data = bytearray()
            while i < len(payload) and payload[i] != 0:
                n = payload[i]
                data += payload[i + 1 : i + 1 + n]
                i += 1 + n
            px = _lzw_decode(bytes(data), min_code, w * h)
            if px is None or len(px) < w * h:
                return None
            return w, h, px
        elif b == 0x3B:
            return None  # trailer before any image
        else:
            return None  # desynced
    return None


def attach_gif_payload(df: DataFrame, id_col: str, max_side: int = 24) -> DataFrame:
    """Media table with REAL GIF bytes: width = 1 + id % max_side,
    height = 1 + (id * 3) % max_side, index(x, y) = (id + 3*x + y) %
    256 — enough structure that only a correct LZW decode + row
    order reproduces the corner probes."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for m in (int(v) for v in pdf["_mid"]):
                w = 1 + m % max_side
                h = 1 + (m * 3) % max_side
                p = make_gif(w, h, lambda x, y, m=m: (m + 3 * x + y) % 256)
                rows.append((m, p, "image/gif", len(p)))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "mime", "n_bytes"]
            )

    return df.select(F.col(id_col).cast("long").alias("_mid")).mapInPandas(
        batches, MEDIA_SCHEMA
    )


GIF_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("sum_index", T.LongType()),
        T.StructField("min_index", T.IntegerType()),
        T.StructField("max_index", T.IntegerType()),
        T.StructField("top_left", T.IntegerType()),
        T.StructField("bottom_right", T.IntegerType()),
    ]
)


def gif_pixel_stats(df: DataFrame) -> DataFrame:
    """Featurization through the full GIF LZW decode: palette-index
    profile + corner probes."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                decoded = decode_gif_pixels(bytes(p))
                if decoded is None:
                    continue
                w, h, px = decoded
                rows.append(
                    (
                        mid, w, h, w * h, sum(px), min(px), max(px),
                        px[0], px[-1],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_pixels", "sum_index",
                    "min_index", "max_index", "top_left", "bottom_right",
                ],
            )

    return df.mapInPandas(batches, GIF_STATS_SCHEMA)


def make_gif_animated(
    width: int, height: int, n_frames: int, index_of
) -> bytes:
    """Spec-valid ANIMATED GIF89a: NETSCAPE loop extension + per-
    frame graphics-control extension + one full-frame image per
    frame. `index_of(f, x, y)` gives frame f's palette index at
    (x, y)."""
    import struct

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes((0xF7, 0, 0))
    for i in range(256):
        out += bytes((i, i, i))
    # NETSCAPE2.0 looping application extension
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in range(n_frames):
        # graphics control: 4/100 s delay, no transparency
        out += b"\x21\xf9\x04\x00\x04\x00\x00\x00"
        frame = make_gif(width, height, lambda x, y, f=f: index_of(f, x, y))
        # splice the image block (descriptor..data) out of the
        # single-frame encoder's output. The block starts at the
        # FIXED offset 6 (header) + 7 (screen descriptor) + 768
        # (palette) = 781 — searching for the 0x2C descriptor byte
        # is wrong, the grayscale palette contains 0x2C at entry 44.
        out += frame[781:-1]  # drop the 0x3b trailer
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(
    payload: bytes, max_frames: int = 64
) -> list[tuple[int, int, list[int]]] | None:
    """ALL frames of a GIF via real LZW decode, in stream order —
    the video-analog decode path. Each entry is (width, height,
    palette-index pixels top-down). None for malformed/interlaced/
    local-palette payloads (the seam). Frames beyond `max_frames`
    are ignored (bounded memory per task)."""
    import struct

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    flags = payload[10]
    i = 13
    if flags & 0x80:
        i += 3 * (2 << (flags & 0x07))
    frames: list[tuple[int, int, list[int]]] = []
    while i < len(payload):
        b = payload[i]
        if b == 0x21:  # extension
            i += 2
            while i < len(payload) and payload[i] != 0:
                i += 1 + payload[i]
            i += 1
        elif b == 0x2C:
            if i + 10 > len(payload):
                return None
            w, h = struct.unpack("<HH", payload[i + 5 : i + 9])
            iflags = payload[i + 9]
            if iflags & 0xC0:
                return None
            if w == 0 or h == 0 or w * h > (1 << 22):
                return None  # zero/hostile dims: bound the decode
            i += 10
            if i >= len(payload):
                return None
            min_code = payload[i]
            i += 1
            data = bytearray()
            while i < len(payload) and payload[i] != 0:
                n = payload[i]
                data += payload[i + 1 : i + 1 + n]
                i += 1 + n
            i += 1  # block terminator
            if len(frames) < max_frames:
                px = _lzw_decode(bytes(data), min_code, w * h)
                if px is None or len(px) < w * h:
                    return None
                frames.append((w, h, px))
        elif b == 0x3B:
            break
        else:
            return None
    return frames if frames else None


def attach_animated_gif_payload(
    df: DataFrame, id_col: str, max_side: int = 12
) -> DataFrame:
    """Media table with REAL animated-GIF bytes: w = 1 + id %
    max_side, h = 1 + (id * 3) % max_side, n_frames = 2 + id % 7,
    frame f's index(x, y) = (id + 5*f + 3*x + y) % 256."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for m in (int(v) for v in pdf["_mid"]):
                w = 1 + m % max_side
                h = 1 + (m * 3) % max_side
                nf = 2 + m % 7
                p = make_gif_animated(
                    w, h, nf,
                    lambda f, x, y, m=m: (m + 5 * f + 3 * x + y) % 256,
                )
                rows.append((m, p, "image/gif", len(p)))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "mime", "n_bytes"]
            )

    return df.select(F.col(id_col).cast("long").alias("_mid")).mapInPandas(
        batches, MEDIA_SCHEMA
    )


GIF_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sum_index", T.LongType()),
        T.StructField("first_pixel", T.IntegerType()),
    ]
)


def sample_gif_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling (upgrades the digest-fake sample_frames):
    decode every frame of each animated GIF through the LZW path,
    keep frames where index % every_n == 0, and emit per-frame
    features — the decode → temporal-subsample → featurize shape of
    a video pipeline, with the decode genuinely executed."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                frames = decode_gif_frames(bytes(p))
                if frames is None:
                    continue
                for fi, (w, h, px) in enumerate(frames):
                    if fi % every_n:
                        continue
                    rows.append(
                        (mid, fi, len(frames), sum(px), px[0])
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_index", "n_frames",
                    "sum_index", "first_pixel",
                ],
            )

    return df.mapInPandas(batches, GIF_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# JPEG: real encode + pixel decode for BASELINE GRAYSCALE JFIF —
# the full pipeline of the format: level shift, 8×8 FDCT,
# quantization, zigzag, DC differential coding, run-length AC with
# canonical Huffman tables, 0xFF byte stuffing. The decoder is not a
# header skim: it rebuilds the Huffman tables from the file's own
# DHT segments, entropy-decodes the bitstream (unstuffing, sign
# extension, ZRL/EOB), dequantizes, and runs the IDCT. Color
# (chroma-subsampled 3-component) and progressive JPEG remain the
# documented seam — decode_jpeg_gray_pixels returns None for them,
# exactly where a full codec would plug in.
# ---------------------------------------------------------------------------

# zigzag scan order: _JPEG_ZZ[k] = row-major index of the k-th
# zigzag coefficient (ITU-T T.81 Figure 5)
_JPEG_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# standard luminance quantization table (T.81 Annex K.1), row-major;
# used as-is = the classic "quality 50" scaling
_JPEG_STD_QT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# standard Huffman tables (T.81 Annex K.3.3): BITS = #codes per code
# length 1..16, HUFFVAL = symbol order
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _jpeg_rh(x: float) -> int:
    """Round half AWAY FROM ZERO — the rounding both the quantizer
    and the IDCT output use, chosen because it is expressible in
    pure integer SQL for the closed-form oracle:
    rh(t/2) == sign(t) * ((|t| + 1) // 2) for integer t."""
    from wilayah_aceh_etl_spark.functions.numeric import round_half_away

    return round_half_away(x)


def _jpeg_build_codes(bits, vals):
    """Canonical Huffman code assignment (T.81 Annex C):
    {symbol: (length, code)}."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


def _jpeg_cos_basis():
    """8×8 DCT-II basis b[u][x] = C(u)·cos((2x+1)uπ/16) with
    C(0)=1/√2, C(u>0)=1."""
    import math

    b = []
    for u in range(8):
        cu = 1.0 / math.sqrt(2.0) if u == 0 else 1.0
        b.append(
            [cu * math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
        )
    return b


_JPEG_BASIS = _jpeg_cos_basis()


class _JpegBitWriter:
    """MSB-first bit accumulator with 0xFF→0xFF00 byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)
                self._acc = 0
                self._n = 0

    def pad_to_byte(self) -> None:
        """Pad the partial byte with 1-bits (T.81 restart alignment)."""
        if self._n:
            self.put((1 << (8 - self._n)) - 1, 8 - self._n)

    def raw(self, data: bytes) -> None:
        """Append marker bytes verbatim (NOT entropy data — no
        stuffing); caller must have byte-aligned first."""
        assert self._n == 0
        self.out += data

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.out)


def _jpeg_fdct_quant(block, qt):
    """Level-shifted 8×8 FDCT then quantization; returns the 64
    quantized coefficients in ROW-MAJOR order."""
    s = [v - 128 for v in block]
    # rows then columns (separable)
    tmp = [0.0] * 64
    for y in range(8):
        for u in range(8):
            acc = 0.0
            bu = _JPEG_BASIS[u]
            for x in range(8):
                acc += s[y * 8 + x] * bu[x]
            tmp[y * 8 + u] = acc
    out = [0] * 64
    for u in range(8):
        for v in range(8):
            acc = 0.0
            bv = _JPEG_BASIS[v]
            for y in range(8):
                acc += tmp[y * 8 + u] * bv[y]
            out[v * 8 + u] = _jpeg_rh(0.25 * acc / qt[v * 8 + u])
    return out


def _jpeg_dequant_idct(coefs, qt):
    """Dequantize 64 row-major coefficients, IDCT, level un-shift,
    clamp to [0, 255]; returns 64 row-major pixels."""
    r = [coefs[i] * qt[i] for i in range(64)]
    # columns then rows (separable inverse)
    tmp = [0.0] * 64
    for u in range(8):
        for y in range(8):
            acc = 0.0
            for v in range(8):
                acc += r[v * 8 + u] * _JPEG_BASIS[v][y]
            tmp[y * 8 + u] = acc
    px = [0] * 64
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for u in range(8):
                acc += tmp[y * 8 + u] * _JPEG_BASIS[u][x]
            p = _jpeg_rh(0.25 * acc) + 128
            px[y * 8 + x] = 0 if p < 0 else (255 if p > 255 else p)
    return px


def _jpeg_mag_bits(v: int) -> tuple[int, int]:
    """(size, raw bits) for a DC diff / AC value: size = bit length
    of |v|; negatives are stored as v + 2^size - 1 (T.81 F.1.2)."""
    size = abs(v).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _jpeg_seg(marker: int, body: bytes) -> bytes:
    """One marker segment: FF <marker> <len+2> <body>."""
    import struct

    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _jpeg_gray_blocks_zz(width, height, value_of, qt) -> list[list[int]]:
    """Zigzag-quantized coefficient arrays for every 8x8 block in
    raster order, edge blocks padded by replication — the shared
    front half of every grayscale encoder (baseline, spectral-
    selection progressive, successive approximation)."""
    blocks = []
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            block = [
                value_of(min(bx + i, width - 1), min(by + j, height - 1))
                & 0xFF
                for j in range(8)
                for i in range(8)
            ]
            q = _jpeg_fdct_quant(block, qt)
            blocks.append([q[_JPEG_ZZ[k]] for k in range(64)])
    return blocks


def _jpeg_gray_headers(width, height, qt, sof_marker: int) -> bytearray:
    """SOI + APP0 + DQT + SOF + DHT for a 1-component gray JFIF —
    the shared header half (sof_marker: 0xC0 baseline, 0xC2
    progressive)."""
    import struct

    out = bytearray(b"\xff\xd8")  # SOI
    out += _jpeg_seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    out += _jpeg_seg(
        0xDB, bytes([0x00]) + bytes(qt[_JPEG_ZZ[k]] for k in range(64))
    )
    out += _jpeg_seg(
        sof_marker,
        struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
    )
    out += _jpeg_seg(
        0xC4,
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
    )
    return out


def make_jpeg_gray(
    width: int,
    height: int,
    value_of,
    qtable: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Spec-valid baseline grayscale JFIF: `value_of(x, y)` gives the
    8-bit gray value at (x, y). Edge blocks are padded by edge
    replication (the standard encoder trick); the decoder crops.
    `qtable` (row-major, default = the Annex-K luminance table)
    lands in the DQT segment in zigzag order.

    `restart_interval` > 0 emits a DRI segment and RST0–7 markers
    every that-many MCUs: the bitstream byte-aligns and the DC
    predictor resets at each marker, which is what makes WITHIN-
    payload parallel decode possible at scale — each restart segment
    is independently decodable, so a 100 MB scan splits into
    restart-bounded work units the same way a parquet file splits
    into row groups."""
    import struct

    qt = list(qtable) if qtable is not None else list(_JPEG_STD_QT)
    dc_codes = _jpeg_build_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_build_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    w = _JpegBitWriter()
    prev_dc = 0
    rst = 0
    for mcu, zz in enumerate(
        _jpeg_gray_blocks_zz(width, height, value_of, qt)
    ):
        if restart_interval and mcu and mcu % restart_interval == 0:
            w.pad_to_byte()
            w.raw(bytes((0xFF, 0xD0 + rst)))
            rst = (rst + 1) % 8
            prev_dc = 0
        # DC: differential
        size, bits = _jpeg_mag_bits(zz[0] - prev_dc)
        prev_dc = zz[0]
        length, code = dc_codes[size]
        w.put(code, length)
        if size:
            w.put(bits, size)
        # AC: run-length of zeros + magnitude, ZRL for 16 zeros
        run = 0
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                length, code = ac_codes[0xF0]  # ZRL
                w.put(code, length)
                run -= 16
            size, bits = _jpeg_mag_bits(zz[k])
            length, code = ac_codes[(run << 4) | size]
            w.put(code, length)
            w.put(bits, size)
            run = 0
        if run:
            length, code = ac_codes[0x00]  # EOB
            w.put(code, length)
    scan = w.flush()

    out = _jpeg_gray_headers(width, height, qt, 0xC0)
    if restart_interval:
        out += _jpeg_seg(0xDD, struct.pack(">H", restart_interval))
    out += _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; raises ValueError past the end / at a marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated scan")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated scan")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    raise ValueError("marker inside scan")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self, expect: int) -> None:
        """Consume an RSTn marker at a restart boundary: drop the
        padding bits of the current byte, then require FFD0+expect
        (markers cycle 0–7, T.81 E.1.4)."""
        self._n = 0  # discard byte-alignment padding
        if self.pos + 2 > len(self.data):
            raise ValueError("truncated at restart boundary")
        if (
            self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + expect
        ):
            raise ValueError("expected restart marker")
        self.pos += 2


def _jpeg_decode_symbol(reader, table) -> int:
    """Walk the canonical code bit by bit ({(length, code): symbol})."""
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code")


def _jpeg_extend(bits: int, size: int) -> int:
    """Sign extension (T.81 F.2.2.1): values with a 0 top bit are
    negative, stored as v + 2^size - 1."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _decode_jpeg_planes(
    payload: bytes,
) -> tuple[int, int, list[list[int]], list[tuple[int, int]]] | None:
    """Shared baseline-JPEG decode core: (width, height, one
    row-major plane per component, per-plane (width, height) dims)
    for GRAYSCALE (1 component) or
    4:4:4 COLOR (3 components, interleaved one block each per MCU,
    per-component quant/Huffman tables and DC predictors). Huffman
    tables come from the file's own DHT segments; restart markers
    realign the reader and reset ALL predictors. None at the
    documented seam: chroma-subsampled / progressive /
    arithmetic-coded / malformed streams."""
    try:
        if len(payload) < 4 or payload[:2] != b"\xff\xd8":
            return None
        qtables: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], dict] = {}
        wid = hei = None
        comp_qt: dict[int, int] = {}  # component id -> quant table id
        comp_hv: dict[int, tuple[int, int]] = {}  # id -> sampling (h, v)
        comp_order: list[int] = []  # component ids in SOF order
        scan_tabs: dict[int, tuple[int, int]] = {}  # id -> (dc, ac)
        restart_interval = 0
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker == 0xD9:  # EOI before SOS
                return None
            seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
            body = payload[pos + 4 : pos + 2 + seg_len]
            if len(body) != seg_len - 2:
                return None  # truncated segment
            if marker == 0xDB:  # DQT (possibly several tables)
                b = 0
                while b < len(body):
                    pq, tq = body[b] >> 4, body[b] & 0x0F
                    if pq != 0 or b + 65 > len(body):
                        return None  # 16-bit table: seam
                    zz = list(body[b + 1 : b + 65])
                    qt = [0] * 64
                    for k in range(64):
                        qt[_JPEG_ZZ[k]] = zz[k]
                    qtables[tq] = qt
                    b += 65
            elif marker == 0xC4:  # DHT (possibly several tables)
                b = 0
                while b + 17 <= len(body):
                    tc, th = body[b] >> 4, body[b] & 0x0F
                    bits = list(body[b + 1 : b + 17])
                    n = sum(bits)
                    vals = list(body[b + 17 : b + 17 + n])
                    if len(vals) != n:
                        return None
                    table = {}
                    code = 0
                    k = 0
                    for length in range(1, 17):
                        for _ in range(bits[length - 1]):
                            table[(length, code)] = vals[k]
                            code += 1
                            k += 1
                        code <<= 1
                    huff[(tc, th)] = table
                    b += 17 + n
            elif marker == 0xC0:  # SOF0 baseline
                if body[0] != 8:
                    return None
                hei = int.from_bytes(body[1:3], "big")
                wid = int.from_bytes(body[3:5], "big")
                ncomp = body[5]
                if ncomp not in (1, 3):
                    return None  # CMYK etc.: seam
                for c in range(ncomp):
                    cid = body[6 + 3 * c]
                    hv = body[7 + 3 * c]
                    h_i, v_i = hv >> 4, hv & 0x0F
                    if h_i not in (1, 2) or v_i not in (1, 2):
                        return None  # exotic sampling: the seam
                    comp_hv[cid] = (h_i, v_i)
                    comp_qt[cid] = body[8 + 3 * c]
                    comp_order.append(cid)
            elif marker in (0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
                return None  # progressive/extended/arithmetic: seam
            elif marker == 0xDD:  # DRI: restart interval in MCUs
                if len(body) != 2:
                    return None
                restart_interval = int.from_bytes(body, "big")
            elif marker == 0xDA:  # SOS → entropy data follows
                if wid is None or hei is None:
                    return None
                if body[0] != len(comp_order):
                    return None  # partial-scan (progressive-ish): seam
                for c in range(body[0]):
                    cid = body[1 + 2 * c]
                    scan_tabs[cid] = (
                        body[2 + 2 * c] >> 4,
                        body[2 + 2 * c] & 0x0F,
                    )
                pos = pos + 2 + seg_len
                break
            pos = pos + 2 + seg_len
        else:
            return None
        if wid == 0 or hei == 0:
            return None
        max_h = max(comp_hv[cid][0] for cid in comp_order)
        max_v = max(comp_hv[cid][1] for cid in comp_order)
        comp_tabs = []
        for cid in comp_order:
            qt = qtables.get(comp_qt.get(cid))
            if cid not in scan_tabs:
                return None
            dc = huff.get((0, scan_tabs[cid][0]))
            ac = huff.get((1, scan_tabs[cid][1]))
            if qt is None or dc is None or ac is None:
                return None
            h_i, v_i = comp_hv[cid]
            # plane dims: the component's own sampling grid (spec
            # A.1.1: ceil(dim * factor / max_factor)) — chroma comes
            # back at ITS resolution; upsampling is display business
            cw = -(-wid * h_i // max_h)
            ch = -(-hei * v_i // max_v)
            comp_tabs.append((qt, dc, ac, h_i, v_i, cw, ch))
        reader = _JpegBitReader(payload, pos)
        n_mcu_x = -(-wid // (8 * max_h))
        n_mcu_y = -(-hei // (8 * max_v))
        planes = [
            [0] * (cw * ch) for (_, _, _, _, _, cw, ch) in comp_tabs
        ]
        dims = [(cw, ch) for (_, _, _, _, _, cw, ch) in comp_tabs]
        prev = [0] * len(comp_order)
        mcu = 0
        rst = 0
        for myi in range(n_mcu_y):
            for mxi in range(n_mcu_x):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    reader.sync_restart(rst)
                    rst = (rst + 1) % 8
                    prev = [0] * len(comp_order)  # ALL predictors reset
                mcu += 1
                for ci, (qt, dc, ac, h_i, v_i, cw, ch) in enumerate(
                    comp_tabs
                ):
                    for bv in range(v_i):
                        for bu in range(h_i):
                            zz = [0] * 64
                            size = _jpeg_decode_symbol(reader, dc)
                            diff = _jpeg_extend(reader.bits(size), size)
                            prev[ci] += diff
                            zz[0] = prev[ci]
                            k = 1
                            while k < 64:
                                rs = _jpeg_decode_symbol(reader, ac)
                                if rs == 0x00:  # EOB
                                    break
                                run, size = rs >> 4, rs & 0x0F
                                if size == 0:
                                    if run != 15:
                                        return None
                                    k += 16  # ZRL
                                    continue
                                k += run
                                if k > 63:
                                    return None
                                zz[k] = _jpeg_extend(
                                    reader.bits(size), size
                                )
                                k += 1
                            coefs = [0] * 64
                            for k in range(64):
                                coefs[_JPEG_ZZ[k]] = zz[k]
                            block = _jpeg_dequant_idct(coefs, qt)
                            px = planes[ci]
                            bx0 = (mxi * h_i + bu) * 8
                            by0 = (myi * v_i + bv) * 8
                            for j in range(8):
                                y = by0 + j
                                if y >= ch:
                                    break
                                for i in range(8):
                                    x = bx0 + i
                                    if x >= cw:
                                        break
                                    px[y * cw + x] = block[j * 8 + i]
        return wid, hei, planes, dims
    except (ValueError, IndexError):
        return None


def decode_jpeg_gray_pixels(
    payload: bytes,
) -> tuple[int, int, list[int]] | None:
    """(width, height, row-major gray pixels) from a baseline
    GRAYSCALE JFIF — full entropy decode with the Huffman tables
    rebuilt from the file's own DHT segments, dequantize, IDCT,
    edge-block crop. None for color streams (use
    decode_jpeg_ycbcr_pixels) and at the documented seam."""
    decoded = _decode_jpeg_planes(payload)
    if decoded is None or len(decoded[2]) != 1:
        return None
    w, h, planes, dims = decoded
    if dims[0] != (w, h):
        return None
    return w, h, planes[0]


def decode_jpeg_ycbcr_pixels(
    payload: bytes,
) -> tuple[int, int, list[int], list[int], list[int]] | None:
    """(width, height, Y, Cb, Cr row-major planes) from a baseline
    4:4:4 COLOR JFIF. None for grayscale streams and at the seam
    (chroma-subsampled / progressive). The RGB conversion is the
    caller's pointwise business — this returns what the codec
    actually stores."""
    decoded = _decode_jpeg_planes(payload)
    if decoded is None or len(decoded[2]) != 3:
        return None
    w, h, planes, dims = decoded
    if any(d != (w, h) for d in dims):
        return None  # subsampled: use decode_jpeg_ycbcr420_pixels
    return w, h, planes[0], planes[1], planes[2]


JPEG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("sum_gray", T.LongType()),
        T.StructField("min_gray", T.IntegerType()),
        T.StructField("max_gray", T.IntegerType()),
        T.StructField("top_left", T.IntegerType()),
        T.StructField("bottom_right", T.IntegerType()),
    ]
)


def attach_jpeg_payload(
    df: DataFrame,
    id_col: str,
    restart_interval: int = 0,
    progressive: bool = False,
    successive: bool = False,
) -> DataFrame:
    """Media table with REAL baseline-JPEG bytes. The images are
    BLOCK-CONSTANT — every 8×8 block holds one value
    (id·7 + 16·bx + 31·by) mod 256 — which makes the lossy decode
    CLOSED-FORM: a constant block's FDCT has only the DC coefficient
    (8·(v−128) = 8s), so the decoded value is exactly
    clamp(128 + 3·rh(s/3)) — pure integer arithmetic a SQL oracle
    can re-derive while the ENGINE still runs the entire real
    pipeline (Huffman, zigzag, quantizer, IDCT, stuffing).

    The DC quantizer is 24 (rest of the table standard) because 24
    makes BOTH rounding stages provably float-robust: 8s/24 = s/3
    can never be a half-integer (2s ≡ 3 mod 6 is impossible), and
    the reconstruction 24·c/8 = 3c is an exact integer — so the
    ~1e-16 error from (1/√2)² in the float basis can never flip a
    round-half decision. With the textbook q₀₀ = 16, odd s lands
    exactly on .5 and the float epsilon's SIGN picks the pixel —
    measured both ways on this box.
    w = 8·(1 + id mod 4), h = 8·(1 + 3·id mod 4)."""

    def batches(it):
        import pandas as pd

        qt = list(_JPEG_STD_QT)
        qt[0] = 24
        for pdf in it:
            rows = []
            for m in (int(v) for v in pdf["_mid"]):
                w = 8 * (1 + m % 4)
                h = 8 * (1 + (m * 3) % 4)
                # ONE definition — the shared closed-form oracle
                # depends on this exact expression across all modes
                value_of = lambda x, y, m=m: (  # noqa: E731
                    m * 7 + 16 * (x // 8) + 31 * (y // 8)
                ) % 256
                if successive:
                    p = make_jpeg_gray_progressive_sa(
                        w, h, value_of, qtable=qt
                    )
                elif progressive:
                    p = make_jpeg_gray_progressive(
                        w, h, value_of, qtable=qt
                    )
                else:
                    p = make_jpeg_gray(
                        w,
                        h,
                        value_of,
                        qtable=qt,
                        restart_interval=restart_interval,
                    )
                rows.append((m, p, "image/jpeg", len(p)))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "mime", "n_bytes"]
            )

    return df.select(F.col(id_col).cast("long").alias("_mid")).mapInPandas(
        batches, MEDIA_SCHEMA
    )


def jpeg_pixel_stats(df: DataFrame) -> DataFrame:
    """Featurization through the full JPEG decode: gray profile plus
    the (0,0) and (w−1,h−1) corner probes that pin block order and
    the DC differential chain (a wrong prev_dc corrupts every later
    block, which the corners and sum expose immediately)."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                decoded = decode_jpeg_gray_pixels(
                    bytes(p)
                ) or decode_jpeg_gray_progressive(bytes(p))
                if decoded is None:
                    continue
                w, h, px = decoded
                rows.append(
                    (
                        mid, w, h, w * h, sum(px), min(px), max(px),
                        px[0], px[h * w - 1],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_pixels", "sum_gray",
                    "min_gray", "max_gray", "top_left", "bottom_right",
                ],
            )

    return df.mapInPandas(batches, JPEG_STATS_SCHEMA)


JPEG_RT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("within_bound", T.BooleanType()),
    ]
)


def jpeg_roundtrip_audit(
    df: DataFrame, id_col: str, tol: int = 4
) -> DataFrame:
    """Oracle-gated GUARANTEE AUDIT for the lossy path on
    NON-block-constant images (sketch-audit pattern): encode a
    gradient image with an ALL-ONES quantization table — the only
    loss left is coefficient rounding, whose worst-case pixel error
    is bounded by ½·Σ|basis| < 4 — decode it, and emit whether
    max|decoded − original| ≤ tol. This drives the AC Huffman path
    hard (dozens of nonzero coefficients per block, runs, ZRL) where
    the closed-form query exercises DC + EOB."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for m in (int(v) for v in pdf["_mid"]):
                w = 8 * (1 + m % 3)
                h = 8 * (1 + (m * 7) % 3)
                orig = [
                    (m + 3 * x + 5 * y) % 256
                    for y in range(h)
                    for x in range(w)
                ]
                p = make_jpeg_gray(
                    w, h, lambda x, y, m=m: (m + 3 * x + 5 * y) % 256,
                    qtable=[1] * 64,
                )
                decoded = decode_jpeg_gray_pixels(p)
                if decoded is None:
                    continue
                _, _, px = decoded
                err = max(abs(a - b) for a, b in zip(px, orig))
                rows.append((m, w, h, w * h, bool(err <= tol)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_pixels", "within_bound",
                ],
            )

    return df.select(F.col(id_col).cast("long").alias("_mid")).mapInPandas(
        batches, JPEG_RT_SCHEMA
    )


# ---------------------------------------------------------------------------
# G.711 μ-law: a REAL standardized lossy audio codec (ITU-T G.711,
# the telephony PCMU format) — logarithmic companding of 16-bit PCM
# to 8-bit codes. Entirely integer arithmetic, so unlike
# transform-based lossy codecs the exact encode→decode chain is
# closed-form re-derivable in SQL: this narrows the "lossy audio"
# seam with a codec whose loss itself is oracle-checkable.
# ---------------------------------------------------------------------------

_ULAW_BIAS = 0x84  # 132
_ULAW_CLIP = 32635


def mulaw_encode(samples: list[int]) -> bytes:
    """16-bit PCM → μ-law bytes (ITU-T G.711): clip to ±32635, add
    the 132 bias, find the segment (exponent of the top magnitude
    bit), keep a 4-bit mantissa, complement the code byte."""
    out = bytearray()
    for x in samples:
        sign = 0x80 if x < 0 else 0x00
        v = min(-x if x < 0 else x, _ULAW_CLIP) + _ULAW_BIAS
        e = 7
        mask = 0x4000
        while e > 0 and not (v & mask):
            mask >>= 1
            e -= 1
        m = (v >> (e + 3)) & 0x0F
        out.append(~(sign | (e << 4) | m) & 0xFF)
    return bytes(out)


def mulaw_decode(payload: bytes) -> list[int]:
    """μ-law bytes → 16-bit PCM. Total function: every byte value is
    a valid code (garbage input decodes to noise, never raises) —
    the property that makes raw μ-law streams chunkable anywhere."""
    out = []
    for code in payload:
        u = ~code & 0xFF
        sign = u & 0x80
        e = (u >> 4) & 0x07
        m = u & 0x0F
        mag = (((m << 3) + _ULAW_BIAS) << e) - _ULAW_BIAS
        out.append(-mag if sign else mag)
    return out


MULAW_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sum_decoded", T.LongType()),
        T.StructField("min_decoded", T.IntegerType()),
        T.StructField("max_decoded", T.IntegerType()),
        T.StructField("max_abs_err", T.IntegerType()),
    ]
)


def mulaw_roundtrip_stats(df: DataFrame, id_col: str) -> DataFrame:
    """Per-stream companding round-trip through the REAL codec:
    deterministic 16-bit samples ((id·31 + k·97) mod 65536 − 32768,
    n = 50 + id mod 50) are μ-law encoded to a byte payload, decoded
    back, and profiled — including max |decoded − original|, the
    codec's actual loss, which the SQL oracle re-derives EXACTLY
    because companding is pure integer arithmetic."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for mid in (int(v) for v in pdf["_mid"]):
                n = 50 + mid % 50
                orig = [
                    ((mid * 31 + k * 97) % 65536) - 32768 for k in range(n)
                ]
                dec = mulaw_decode(mulaw_encode(orig))
                rows.append(
                    (
                        mid,
                        n,
                        sum(dec),
                        min(dec),
                        max(dec),
                        max(abs(d - o) for d, o in zip(dec, orig)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_samples", "sum_decoded",
                    "min_decoded", "max_decoded", "max_abs_err",
                ],
            )

    return df.select(F.col(id_col).cast("long").alias("_mid")).mapInPandas(
        batches, MULAW_STATS_SCHEMA
    )


# ---------------------------------------------------------------------------
# JPEG color (4:4:4 YCbCr): the 3-component interleaved form — per-
# MCU Y/Cb/Cr blocks, separate quantization tables, separate Huffman
# table pairs, THREE independent DC prediction chains. This is the
# JPEG-specific machinery of color; chroma SUBSAMPLING (4:2:0) and
# progressive scans remain the documented seam.
# ---------------------------------------------------------------------------

# standard chroma quantization table (T.81 Annex K.2), row-major
_JPEG_STD_QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# standard chroma Huffman tables (T.81 Annex K.3.3.2)
_JPEG_DC_BITS_CHROMA = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_JPEG_DC_VALS_CHROMA = list(range(12))
_JPEG_AC_BITS_CHROMA = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_JPEG_AC_VALS_CHROMA = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _jpeg_encode_block(w, block, qt, dc_codes, ac_codes, prev_dc):
    """Entropy-encode one level-shifted 8×8 block; returns its DC."""
    q = _jpeg_fdct_quant(block, qt)
    zz = [q[_JPEG_ZZ[k]] for k in range(64)]
    size, bits = _jpeg_mag_bits(zz[0] - prev_dc)
    length, code = dc_codes[size]
    w.put(code, length)
    if size:
        w.put(bits, size)
    run = 0
    for k in range(1, 64):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]
            w.put(code, length)
            run -= 16
        size, bits = _jpeg_mag_bits(zz[k])
        length, code = ac_codes[(run << 4) | size]
        w.put(code, length)
        w.put(bits, size)
        run = 0
    if run:
        length, code = ac_codes[0x00]
        w.put(code, length)
    return zz[0]


def make_jpeg_ycbcr(
    width: int,
    height: int,
    ycbcr_of,
    qtable_y: list[int] | None = None,
    qtable_c: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Spec-valid baseline COLOR JFIF, 4:4:4 (no chroma subsampling):
    `ycbcr_of(x, y)` returns the (Y, Cb, Cr) triple at (x, y). Per
    MCU the scan interleaves one Y, one Cb, one Cr block; Y uses
    quant table 0 + Huffman pair 0, chroma uses table 1 + pair 1 —
    THREE independent DC predictors, all reset at restart markers.
    (The RGB↔YCbCr pointwise transform is deliberately outside this
    function: callers supply YCbCr so the codec pipeline — the part
    that is actually JPEG — stays closed-form testable.)"""
    import struct

    qty = list(qtable_y) if qtable_y is not None else list(_JPEG_STD_QT)
    qtc = (
        list(qtable_c)
        if qtable_c is not None
        else list(_JPEG_STD_QT_CHROMA)
    )
    dc0 = _jpeg_build_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac0 = _jpeg_build_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    dc1 = _jpeg_build_codes(_JPEG_DC_BITS_CHROMA, _JPEG_DC_VALS_CHROMA)
    ac1 = _jpeg_build_codes(_JPEG_AC_BITS_CHROMA, _JPEG_AC_VALS_CHROMA)
    w = _JpegBitWriter()
    prev = [0, 0, 0]
    mcu = 0
    rst = 0
    comp_tabs = [(qty, dc0, ac0), (qtc, dc1, ac1), (qtc, dc1, ac1)]
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                w.pad_to_byte()
                w.raw(bytes((0xFF, 0xD0 + rst)))
                rst = (rst + 1) % 8
                prev = [0, 0, 0]
            mcu += 1
            pix = [
                ycbcr_of(min(bx + i, width - 1), min(by + j, height - 1))
                for j in range(8)
                for i in range(8)
            ]
            for ci, (qt, dcc, acc) in enumerate(comp_tabs):
                block = [p[ci] & 0xFF for p in pix]
                prev[ci] = _jpeg_encode_block(
                    w, block, qt, dcc, acc, prev[ci]
                )
    scan = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    out += seg(
        0xDB,
        bytes([0x00]) + bytes(qty[_JPEG_ZZ[k]] for k in range(64))
        + bytes([0x01]) + bytes(qtc[_JPEG_ZZ[k]] for k in range(64)),
    )
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
        + bytes([0x01]) + bytes(_JPEG_DC_BITS_CHROMA)
        + bytes(_JPEG_DC_VALS_CHROMA)
        + bytes([0x11]) + bytes(_JPEG_AC_BITS_CHROMA)
        + bytes(_JPEG_AC_VALS_CHROMA),
    )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


JPEG_COLOR_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("sum_y", T.LongType()),
        T.StructField("sum_cb", T.LongType()),
        T.StructField("sum_cr", T.LongType()),
        T.StructField("y_top_left", T.IntegerType()),
        T.StructField("cr_bottom_right", T.IntegerType()),
    ]
)


def attach_color_jpeg_payload(
    df: DataFrame,
    id_col: str,
    restart_interval: int = 0,
    progressive: bool = False,
    successive: bool = False,
) -> DataFrame:
    """Media table with REAL 4:4:4 color JPEG bytes, block-constant
    per channel (Y/Cb/Cr get independent gradients over the block
    grid), q00 = 24 on BOTH quant tables so every channel's decode
    follows the same float-robust closed form as the grayscale
    query. w = 8·(1 + id mod 3), h = 8·(1 + 5·id mod 3)."""

    def batches(it):
        import pandas as pd

        qy = list(_JPEG_STD_QT)
        qy[0] = 24
        qc = list(_JPEG_STD_QT_CHROMA)
        qc[0] = 24
        for pdf in it:
            rows = []
            for m in (int(v) for v in pdf["_mid"]):
                w = 8 * (1 + m % 3)
                h = 8 * (1 + (m * 5) % 3)

                def ycbcr(x, y, m=m):
                    bx, by = x // 8, y // 8
                    return (
                        (m * 7 + 16 * bx + 31 * by) % 256,
                        (m * 11 + 8 * bx + 23 * by) % 256,
                        (m * 13 + 29 * bx + 5 * by) % 256,
                    )

                if successive:
                    p = make_jpeg_ycbcr_progressive_sa(
                        w, h, ycbcr, qtable_y=qy, qtable_c=qc
                    )
                elif progressive:
                    p = make_jpeg_ycbcr_progressive(
                        w, h, ycbcr, qtable_y=qy, qtable_c=qc
                    )
                else:
                    p = make_jpeg_ycbcr(
                        w, h, ycbcr, qtable_y=qy, qtable_c=qc,
                        restart_interval=restart_interval,
                    )
                rows.append((m, p, "image/jpeg", len(p)))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "mime", "n_bytes"]
            )

    return df.select(F.col(id_col).cast("long").alias("_mid")).mapInPandas(
        batches, MEDIA_SCHEMA
    )


def jpeg_color_pixel_stats(df: DataFrame) -> DataFrame:
    """Featurization through the full COLOR decode: per-plane sums
    plus corner probes on the FIRST (Y) and LAST (Cr) components —
    the pair that catches a wrong component interleave order or a
    cross-component DC predictor mix-up immediately."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                decoded = decode_jpeg_ycbcr_pixels(
                    bytes(p)
                ) or decode_jpeg_ycbcr_progressive(bytes(p))
                if decoded is None:
                    continue
                w, h, yy, cb, cr = decoded
                rows.append(
                    (
                        mid, w, h, w * h, sum(yy), sum(cb), sum(cr),
                        yy[0], cr[h * w - 1],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_pixels",
                    "sum_y", "sum_cb", "sum_cr",
                    "y_top_left", "cr_bottom_right",
                ],
            )

    return df.mapInPandas(batches, JPEG_COLOR_STATS_SCHEMA)


def make_jpeg_ycbcr_420(
    width: int,
    height: int,
    ycbcr_of,
    qtable_y: list[int] | None = None,
    qtable_c: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Baseline color JFIF with 4:2:0 CHROMA SUBSAMPLING — the MCU
    geometry virtually every camera JPEG uses: per 16×16 MCU the
    scan carries FOUR Y blocks (raster order within the MCU) and ONE
    8×8 block each of Cb/Cr sampled at half resolution. Chroma is
    POINT-SAMPLED at the even pixel grid (the subsampling filter is
    encoder's choice per the spec; point sampling keeps the
    closed-form oracle exact — an averaging filter slots in here).
    Edge MCUs pad by edge replication; the decoder crops. Restart
    markers reset all three predictors, as in 4:4:4."""
    import struct

    qty = list(qtable_y) if qtable_y is not None else list(_JPEG_STD_QT)
    qtc = (
        list(qtable_c)
        if qtable_c is not None
        else list(_JPEG_STD_QT_CHROMA)
    )
    dc0 = _jpeg_build_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac0 = _jpeg_build_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    dc1 = _jpeg_build_codes(_JPEG_DC_BITS_CHROMA, _JPEG_DC_VALS_CHROMA)
    ac1 = _jpeg_build_codes(_JPEG_AC_BITS_CHROMA, _JPEG_AC_VALS_CHROMA)
    w = _JpegBitWriter()
    prev = [0, 0, 0]
    mcu = 0
    rst = 0

    def clamped(x, y):
        return ycbcr_of(min(x, width - 1), min(y, height - 1))

    for my in range(0, height, 16):
        for mx in range(0, width, 16):
            if restart_interval and mcu and mcu % restart_interval == 0:
                w.pad_to_byte()
                w.raw(bytes((0xFF, 0xD0 + rst)))
                rst = (rst + 1) % 8
                prev = [0, 0, 0]
            mcu += 1
            # four Y blocks, raster order within the MCU
            for bv in range(2):
                for bu in range(2):
                    block = [
                        clamped(mx + bu * 8 + i, my + bv * 8 + j)[0] & 0xFF
                        for j in range(8)
                        for i in range(8)
                    ]
                    prev[0] = _jpeg_encode_block(
                        w, block, qty, dc0, ac0, prev[0]
                    )
            # one Cb + one Cr block, point-sampled every 2nd pixel
            for ci in (1, 2):
                block = [
                    clamped(mx + 2 * i, my + 2 * j)[ci] & 0xFF
                    for j in range(8)
                    for i in range(8)
                ]
                prev[ci] = _jpeg_encode_block(
                    w, block, qtc, dc1, ac1, prev[ci]
                )
    scan = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    out += seg(
        0xDB,
        bytes([0x00]) + bytes(qty[_JPEG_ZZ[k]] for k in range(64))
        + bytes([0x01]) + bytes(qtc[_JPEG_ZZ[k]] for k in range(64)),
    )
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
        + bytes([0x01]) + bytes(_JPEG_DC_BITS_CHROMA)
        + bytes(_JPEG_DC_VALS_CHROMA)
        + bytes([0x11]) + bytes(_JPEG_AC_BITS_CHROMA)
        + bytes(_JPEG_AC_VALS_CHROMA),
    )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_ycbcr420_pixels(
    payload: bytes,
) -> tuple[int, int, list[int], int, int, list[int], list[int]] | None:
    """(width, height, Y, chroma_w, chroma_h, Cb, Cr) from a 4:2:0
    baseline color JFIF: the full-resolution luma plane plus the
    chroma planes AT THEIR STORED half resolution — what the codec
    actually keeps; upsampling (replication/bilinear) is display
    business, not decode."""
    decoded = _decode_jpeg_planes(payload)
    if decoded is None or len(decoded[2]) != 3:
        return None
    w, h, planes, dims = decoded
    if dims[0] != (w, h) or dims[1] != dims[2] or dims[1] == (w, h):
        return None  # not the 4:2:0 layout
    cw, ch = dims[1]
    return w, h, planes[0], cw, ch, planes[1], planes[2]


JPEG_420_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("chroma_w", T.IntegerType()),
        T.StructField("chroma_h", T.IntegerType()),
        T.StructField("sum_y", T.LongType()),
        T.StructField("sum_cb", T.LongType()),
        T.StructField("sum_cr", T.LongType()),
        T.StructField("y_top_left", T.IntegerType()),
        T.StructField("cb_bottom_right", T.IntegerType()),
    ]
)


def jpeg_420_pixel_stats(df: DataFrame, id_col: str) -> DataFrame:
    """End-to-end 4:2:0 pipeline: encode MCU-constant color images
    (value grids keyed on the 16×16 MCU), decode through the
    subsampled MCU geometry, profile all three planes at their
    stored resolutions. w = 16·(1 + id mod 2), h = 16·(1 + 3·id
    mod 2); Y/Cb/Cr grids as in attach_color_jpeg_payload but on the
    MCU lattice; restart_interval=1 so every MCU boundary exercises
    the all-predictor reset."""

    def batches(it):
        import pandas as pd

        qy = list(_JPEG_STD_QT)
        qy[0] = 24
        qc = list(_JPEG_STD_QT_CHROMA)
        qc[0] = 24
        for pdf in it:
            rows = []
            for m in (int(v) for v in pdf["_mid"]):
                w = 16 * (1 + m % 2)
                h = 16 * (1 + (m * 3) % 2)

                def ycbcr(x, y, m=m):
                    bx, by = x // 16, y // 16
                    return (
                        (m * 7 + 16 * bx + 31 * by) % 256,
                        (m * 11 + 8 * bx + 23 * by) % 256,
                        (m * 13 + 29 * bx + 5 * by) % 256,
                    )

                p = make_jpeg_ycbcr_420(
                    w, h, ycbcr, qtable_y=qy, qtable_c=qc,
                    restart_interval=1,
                )
                decoded = decode_jpeg_ycbcr420_pixels(p)
                if decoded is None:
                    continue
                W, H, yy, cw, ch, cb, cr = decoded
                rows.append(
                    (
                        m, W, H, cw, ch, sum(yy), sum(cb), sum(cr),
                        yy[0], cb[cw * ch - 1],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "chroma_w", "chroma_h",
                    "sum_y", "sum_cb", "sum_cr",
                    "y_top_left", "cb_bottom_right",
                ],
            )

    return df.select(F.col(id_col).cast("long").alias("_mid")).mapInPandas(
        batches, JPEG_420_STATS_SCHEMA
    )


# ---------------------------------------------------------------------------
# IMA ADPCM (DVI4): the classic 4-bit adaptive-differential audio
# codec — SEQUENTIAL per-stream state (predictor + step index), the
# codec counterpart of the engine's chained-iteration devices: the
# oracle replays the exact state recursion in a recursive CTE.
# ---------------------------------------------------------------------------

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
_IMA_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def ima_adpcm_encode(samples: list[int]) -> bytes:
    """16-bit PCM → 4-bit IMA ADPCM codes (one code per byte's low
    nibble here — byte-per-code keeps chunk arithmetic trivial; the
    2-codes-per-byte packing is container business). The encoder
    mirrors the decoder's state (predictor = the DECODED value), the
    property that keeps the two from drifting apart."""
    pred, idx = 0, 0
    out = bytearray()
    for x in samples:
        step = _IMA_STEPS[idx]
        diff = x - pred
        sign = 8 if diff < 0 else 0
        ad = -diff if diff < 0 else diff
        delta = 0
        vpdiff = step >> 3
        if ad >= step:
            delta = 4
            ad -= step
            vpdiff += step
        if ad >= step >> 1:
            delta |= 2
            ad -= step >> 1
            vpdiff += step >> 1
        if ad >= step >> 2:
            delta |= 1
            vpdiff += step >> 2
        pred += -vpdiff if sign else vpdiff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + _IMA_INDEX_ADJ[delta]))
        out.append(sign | delta)
    return bytes(out)


def ima_adpcm_decode(payload: bytes) -> list[int]:
    """4-bit IMA ADPCM codes → 16-bit PCM, replaying the exact state
    recursion (step table walk, 3-bit magnitude reconstruction with
    the step>>3 rounding term, predictor clamp, index clamp)."""
    pred, idx = 0, 0
    out = []
    for code in payload:
        code &= 0x0F
        step = _IMA_STEPS[idx]
        delta = code & 7
        vpdiff = step >> 3
        if delta & 4:
            vpdiff += step
        if delta & 2:
            vpdiff += step >> 1
        if delta & 1:
            vpdiff += step >> 2
        pred += -vpdiff if code & 8 else vpdiff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + _IMA_INDEX_ADJ[delta]))
        out.append(pred)
    return out


# ---------------------------------------------------------------------------
# Haar subband audio codec: the SUBBAND/WAVELET transform-coding
# class (the architecture family of MPEG layer 1/2 and JPEG2000's
# integer 5/3 path) in its exactly-invertible integer form. Two
# S-transform (lifting Haar) levels split the signal into a coarse
# band (kept exact) and two detail bands (deadzone-quantized, the
# H.264-style q*trunc(d/q) quantizer), packed into a real bitstream.
# Every operation is integer with TRUNCATING division — chosen to
# match SQL `//` semantics so a DuckDB oracle replays the codec's
# loss exactly (DETERMINISM.md: Python floor-div and SQL trunc-div
# disagree on negatives; the codec standardizes on trunc).
# ---------------------------------------------------------------------------


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — SQL `//`."""
    q = abs(a) // b
    return -q if a < 0 else q


def haar_subband_encode(
    samples: list[int], q1: int = 8, q2: int = 4
) -> bytes:
    """PCM → 2-level integer-Haar subband bitstream. n must be a
    multiple of 4. Level 1: d1[i] = x[2i] - x[2i+1], s1[i] = x[2i+1]
    + trunc(d1/2) (the S-transform — exactly invertible). Level 2
    repeats on s1. The coarse band s2 is stored exact; the detail
    bands are deadzone-quantized to trunc(d/q). Layout: magic 'HSB1',
    n:u16, q1:u8, q2:u8, then s2 / dq2 / dq1 as int16 LE."""
    n = len(samples)
    if n % 4 != 0:
        raise ValueError("haar_subband_encode: n must be divisible by 4")
    d1, s1 = [], []
    for i in range(n // 2):
        a, b = samples[2 * i], samples[2 * i + 1]
        d = a - b
        d1.append(d)
        s1.append(b + _tdiv(d, 2))
    d2, s2 = [], []
    for j in range(n // 4):
        a, b = s1[2 * j], s1[2 * j + 1]
        d = a - b
        d2.append(d)
        s2.append(b + _tdiv(d, 2))
    import struct as _struct

    out = bytearray(b"HSB1")
    out += _struct.pack("<HBB", n, q1, q2)
    for v in s2:
        out += _struct.pack("<h", v)
    for v in d2:
        out += _struct.pack("<h", _tdiv(v, q2))
    for v in d1:
        out += _struct.pack("<h", _tdiv(v, q1))
    return bytes(out)


def haar_subband_decode(payload: bytes) -> list[int]:
    """Haar subband bitstream → PCM. Dequantizes the detail bands as
    q*dq (deadzone midpoint at zero) and inverts both lifting
    levels: b = s - trunc(d/2), a = b + d."""
    import struct as _struct

    if payload[:4] != b"HSB1":
        raise ValueError("bad magic")
    n, q1, q2 = _struct.unpack_from("<HBB", payload, 4)
    off = 8
    n2, n4 = n // 2, n // 4
    s2 = list(_struct.unpack_from(f"<{n4}h", payload, off))
    off += 2 * n4
    d2 = [v * q2 for v in _struct.unpack_from(f"<{n4}h", payload, off)]
    off += 2 * n4
    d1 = [v * q1 for v in _struct.unpack_from(f"<{n2}h", payload, off)]
    s1 = []
    for j in range(n4):
        b = s2[j] - _tdiv(d2[j], 2)
        s1.extend((b + d2[j], b))
    out = []
    for i in range(n2):
        b = s1[i] - _tdiv(d1[i], 2)
        out.extend((b + d1[i], b))
    return out


# ---------------------------------------------------------------------------
# Motion-compensated video codec: the I/P-frame architecture of
# MPEG-class video — a raw intra frame, then per 8x8 block a motion
# SEARCH over horizontal candidates against the RECONSTRUCTED
# previous frame (closed-loop prediction, the property that keeps
# encoder and decoder state identical), a deadzone-quantized
# residual, and a packed bitstream. Motion compensation addresses
# the previous frame TOROIDALLY in x (documented deviation from
# edge-clamping codecs: wrap keeps every candidate defined, which is
# what makes the best-match argmin provable for the SQL oracle).
# ---------------------------------------------------------------------------

_VMC_CANDIDATES = (0, 1, 2, 3)  # horizontal shifts searched, in order
_VMC_BLOCK = 8
_VMC_Q = 4


def video_mc_encode(frames: list[list[int]], w: int, h: int) -> bytes:
    """Row-major grayscale frames → I/P bitstream. Frame 0 is stored
    raw (one byte per pixel, so frame values must be 0..255). Each
    P-frame stores, per 8x8 block in row-major block order: one mv
    index byte (into the candidate shift table) chosen by exhaustive
    SAD search against the reconstructed previous frame, then 64
    residual bytes dq+128 with dq = trunc(r/4) (int8 range asserted
    — this codec targets smooth synthetic content, not a clip-safe
    general encoder). Layout: 'VMC1', w:u8, h:u8, n_frames:u8, 0."""
    import struct as _struct

    if w % _VMC_BLOCK or h % _VMC_BLOCK:
        raise ValueError("frame dims must be multiples of the block size")
    if not (0 < w <= 255 and 0 < h <= 255 and 0 < len(frames) <= 255):
        raise ValueError("w, h, n_frames must fit the u8 header fields")
    nb_x, nb_y = w // _VMC_BLOCK, h // _VMC_BLOCK
    out = bytearray(b"VMC1")
    out += _struct.pack("<BBBB", w, h, len(frames), 0)
    recon = list(frames[0])
    if any(p < 0 or p > 255 for p in recon):
        raise ValueError("I-frame pixels must be bytes")
    out += bytes(recon)
    for t in range(1, len(frames)):
        cur = frames[t]
        new_recon = [0] * (w * h)
        for by in range(nb_y):
            for bx in range(nb_x):
                best_mv, best_sad = 0, None
                for mi, dx in enumerate(_VMC_CANDIDATES):
                    sad = 0
                    for yy in range(_VMC_BLOCK):
                        y = by * _VMC_BLOCK + yy
                        row = y * w
                        for xx in range(_VMC_BLOCK):
                            x = bx * _VMC_BLOCK + xx
                            sad += abs(
                                cur[row + x]
                                - recon[row + (x - dx) % w]
                            )
                    if best_sad is None or sad < best_sad:
                        best_mv, best_sad = mi, sad
                dx = _VMC_CANDIDATES[best_mv]
                out.append(best_mv)
                for yy in range(_VMC_BLOCK):
                    y = by * _VMC_BLOCK + yy
                    row = y * w
                    for xx in range(_VMC_BLOCK):
                        x = bx * _VMC_BLOCK + xx
                        pred = recon[row + (x - dx) % w]
                        r = cur[row + x] - pred
                        dq = _tdiv(r, _VMC_Q)
                        if not -128 <= dq <= 127:
                            raise ValueError("residual out of int8 range")
                        out.append(dq + 128)
                        new_recon[row + x] = pred + dq * _VMC_Q
        recon = new_recon
    return bytes(out)


def video_mc_decode(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """I/P bitstream → (w, h, frames). Mirrors the encoder's
    closed-loop state: each P-frame block is motion-compensated from
    the reconstructed previous frame (toroidal x) plus q*dq."""
    import struct as _struct

    if payload[:4] != b"VMC1":
        raise ValueError("bad magic")
    w, h, nf, _ = _struct.unpack_from("<BBBB", payload, 4)
    off = 8
    recon = list(payload[off : off + w * h])
    off += w * h
    frames = [list(recon)]
    nb_x, nb_y = w // _VMC_BLOCK, h // _VMC_BLOCK
    for _t in range(1, nf):
        new_recon = [0] * (w * h)
        for by in range(nb_y):
            for bx in range(nb_x):
                dx = _VMC_CANDIDATES[payload[off]]
                off += 1
                for yy in range(_VMC_BLOCK):
                    y = by * _VMC_BLOCK + yy
                    row = y * w
                    for xx in range(_VMC_BLOCK):
                        x = bx * _VMC_BLOCK + xx
                        dq = payload[off] - 128
                        off += 1
                        new_recon[row + x] = (
                            recon[row + (x - dx) % w] + dq * _VMC_Q
                        )
        recon = new_recon
        frames.append(list(recon))
    return w, h, frames


# ---------------------------------------------------------------------------
# PROGRESSIVE JPEG (spectral selection): the SOF2 mode that ships a
# DC scan first and the AC spectrum in band scans — the "image
# sharpens as it loads" format. This implementation covers the
# spectral-selection dimension with Ah=Al=0 (no successive
# approximation — that refinement dimension and progressive restart
# markers remain the documented seam). Progressive reorders the
# BITSTREAM, never the coefficients: the same quantized values
# arrive split across scans, so decode is bit-identical to the
# baseline encoding of the same image — which is exactly what the
# shared closed-form oracle and the equality property test pin.
# ---------------------------------------------------------------------------


def make_jpeg_gray_progressive(
    width: int,
    height: int,
    value_of,
    qtable: list[int] | None = None,
    bands: tuple[tuple[int, int], ...] = ((1, 5), (6, 63)),
) -> bytes:
    """Spec-valid PROGRESSIVE (SOF2) grayscale JFIF via spectral
    selection: scan 1 carries every block's DC coefficient
    (Ss=Se=0), then one scan per (Ss, Se) band carries that slice of
    the AC spectrum for all blocks. Within an AC band the coding is
    the T.81 G.1.2.2 form; end-of-band runs are emitted one block at
    a time (EOB = symbol 0x00, an EOBRUN of 1), which keeps the
    Annex-K Huffman tables sufficient — the decoder still implements
    general EOBn. Bands must tile [1, 63] in order."""
    qt = list(qtable) if qtable is not None else list(_JPEG_STD_QT)
    dc_codes = _jpeg_build_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_build_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    blocks_zz = _jpeg_gray_blocks_zz(width, height, value_of, qt)
    seg = _jpeg_seg
    out = _jpeg_gray_headers(width, height, qt, 0xC2)
    # scan 1: DC, full precision (Ah=Al=0)
    w = _JpegBitWriter()
    prev = 0
    for zz in blocks_zz:
        size, bits = _jpeg_mag_bits(zz[0] - prev)
        prev = zz[0]
        length, code = dc_codes[size]
        w.put(code, length)
        if size:
            w.put(bits, size)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0]))
    out += w.flush()
    # AC band scans
    expect = 1
    for ss, se in bands:
        if ss != expect or se < ss or se > 63:
            raise ValueError("bands must tile [1, 63] in order")
        expect = se + 1
        w = _JpegBitWriter()
        for zz in blocks_zz:
            run = 0
            k = ss
            while k <= se:
                if zz[k] == 0:
                    run += 1
                    k += 1
                    continue
                while run > 15:
                    length, code = ac_codes[0xF0]  # ZRL
                    w.put(code, length)
                    run -= 16
                size, bits = _jpeg_mag_bits(zz[k])
                length, code = ac_codes[(run << 4) | size]
                w.put(code, length)
                w.put(bits, size)
                run = 0
                k += 1
            if run:  # rest of band zero → EOB (EOBRUN of exactly 1)
                length, code = ac_codes[0x00]
                w.put(code, length)
        out += seg(0xDA, bytes([1, 1, 0x00, ss, se, 0]))
        out += w.flush()
    if expect != 64:
        raise ValueError("bands must tile [1, 63] in order")
    out += b"\xff\xd9"
    return bytes(out)


def _jpeg_ac_refine_scan_decode(
    reader, ac, coef, n_blocks, ss, se, p1
) -> bool:
    """Decode one AC refinement scan (T.81 G.1.2.3) into the
    per-block zigzag arrays `coef`: runs count zero-history
    positions, every nonzero-history coefficient passed reads one
    correction bit, EOBn covers whole blocks whose nonzero-history
    coefficients still read correction bits. Shared by the grayscale
    and color progressive decoders. False on malformed input."""
    eobrun = 0
    for b in range(n_blocks):
        cf = coef[b]
        if eobrun:
            eobrun -= 1
            for k in range(ss, se + 1):
                if cf[k] and reader.bit():
                    cf[k] += p1 if cf[k] > 0 else -p1
            continue
        k = ss
        while k <= se:
            rs = _jpeg_decode_symbol(reader, ac)
            r, s = rs >> 4, rs & 0x0F
            if s == 0 and r != 15:  # EOBn
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.bits(r)
                for kk in range(k, se + 1):
                    if cf[kk] and reader.bit():
                        cf[kk] += p1 if cf[kk] > 0 else -p1
                break
            if s:
                if s != 1:
                    return False  # new coef must be +-1
                val = p1 if reader.bit() else -p1
            zeros = 0
            target = 16 if s == 0 else r
            while k <= se:
                if cf[k]:
                    if reader.bit():
                        cf[k] += p1 if cf[k] > 0 else -p1
                    k += 1
                    continue
                if s == 0:  # ZRL: exactly 16 zeros
                    zeros += 1
                    k += 1
                    if zeros == target:
                        break
                    continue
                if zeros == target:
                    break  # placement position
                zeros += 1
                k += 1
            if s:
                if k > se:
                    return False
                cf[k] = val
                k += 1
    return True


def decode_jpeg_gray_progressive(
    payload: bytes,
) -> tuple[int, int, list[int]] | None:
    """(width, height, row-major gray pixels) from a PROGRESSIVE
    (SOF2) spectral-selection grayscale JFIF: accumulates each
    scan's coefficient slice (DC scan with a differential predictor,
    AC band scans with general EOBn end-of-band runs per T.81
    G.1.2.2) into per-block zigzag arrays, then dequantizes and
    IDCTs once after EOI. SUCCESSIVE APPROXIMATION is real too:
    first scans at reduced precision (point transform — arithmetic
    shift for DC, magnitude truncation for AC), then refinement
    scans (raw DC bits; G.1.2.3 AC coding where runs count
    zero-history positions and passed nonzero-history coefficients
    each read a correction bit). None at the documented seam:
    multi-component progressive scans, progressive restart
    intervals, and malformed streams."""
    try:
        if len(payload) < 4 or payload[:2] != b"\xff\xd8":
            return None
        qtables: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], dict] = {}
        wid = hei = None
        comp_qt_id = None
        coef: list[list[int]] | None = None
        n_blocks = 0
        pos = 2
        while pos + 2 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker == 0xD9:  # EOI
                break
            if pos + 4 > len(payload):
                return None
            seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
            body = payload[pos + 4 : pos + 2 + seg_len]
            if len(body) != seg_len - 2:
                return None
            if marker == 0xDB:
                b = 0
                while b < len(body):
                    pq, tq = body[b] >> 4, body[b] & 0x0F
                    if pq != 0 or b + 65 > len(body):
                        return None
                    zz = list(body[b + 1 : b + 65])
                    qt = [0] * 64
                    for k in range(64):
                        qt[_JPEG_ZZ[k]] = zz[k]
                    qtables[tq] = qt
                    b += 65
            elif marker == 0xC4:
                b = 0
                while b + 17 <= len(body):
                    tc, th = body[b] >> 4, body[b] & 0x0F
                    bits = list(body[b + 1 : b + 17])
                    n = sum(bits)
                    vals = list(body[b + 17 : b + 17 + n])
                    if len(vals) != n:
                        return None
                    table = {}
                    code = 0
                    k = 0
                    for length in range(1, 17):
                        for _ in range(bits[length - 1]):
                            table[(length, code)] = vals[k]
                            code += 1
                            k += 1
                        code <<= 1
                    huff[(tc, th)] = table
                    b += 17 + n
            elif marker == 0xC2:  # SOF2 progressive
                if body[0] != 8 or body[5] != 1:
                    return None  # multi-component progressive: seam
                hei = int.from_bytes(body[1:3], "big")
                wid = int.from_bytes(body[3:5], "big")
                if body[7] != 0x11:
                    return None
                comp_qt_id = body[8]
                if wid == 0 or hei == 0:
                    return None
                n_blocks = (-(-wid // 8)) * (-(-hei // 8))
                coef = [[0] * 64 for _ in range(n_blocks)]
            elif marker in (0xC0, 0xC1, 0xC3, 0xC9, 0xCA, 0xCB):
                return None  # sequential/arithmetic: other decoders
            elif marker == 0xDD:
                return None  # progressive restart intervals: seam
            elif marker == 0xDA:
                if coef is None or body[0] != 1:
                    return None
                tds = body[2]
                ss, se = body[3], body[4]
                ah, al = body[5] >> 4, body[5] & 0x0F
                if ah and ah != al + 1:
                    return None  # refinement must narrow one bit
                reader = _JpegBitReader(payload, pos + 2 + seg_len)
                p1 = 1 << al
                if ss == 0:
                    if se != 0:
                        return None  # DC+AC mixed scan illegal in SOF2
                    if ah == 0:
                        dc = huff.get((0, tds >> 4))
                        if dc is None:
                            return None
                        prev = 0
                        for b in range(n_blocks):
                            size = _jpeg_decode_symbol(reader, dc)
                            prev += _jpeg_extend(reader.bits(size), size)
                            coef[b][0] = prev << al
                    else:
                        # DC refinement: one raw bit per block; the
                        # arithmetic-shift point transform makes it a
                        # two's-complement OR
                        for b in range(n_blocks):
                            if reader.bit():
                                coef[b][0] |= p1
                elif ah == 0:
                    ac = huff.get((1, tds & 0x0F))
                    if ac is None or ss > se or se > 63:
                        return None
                    eobrun = 0
                    for b in range(n_blocks):
                        if eobrun:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            rs = _jpeg_decode_symbol(reader, ac)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += reader.bits(r)
                                break
                            k += r
                            if k > se:
                                return None
                            coef[b][k] = (
                                _jpeg_extend(reader.bits(s), s) << al
                            )
                            k += 1
                else:
                    # AC refinement: shared G.1.2.3 walk
                    ac = huff.get((1, tds & 0x0F))
                    if ac is None or ss > se or se > 63:
                        return None
                    if not _jpeg_ac_refine_scan_decode(
                        reader, ac, coef, n_blocks, ss, se, p1
                    ):
                        return None
                pos = reader.pos
                continue
            pos += 2 + seg_len
        else:
            return None  # ran out of bytes before EOI
        if coef is None or wid is None:
            return None
        qt = qtables.get(comp_qt_id)
        if qt is None:
            return None
        nbx = -(-wid // 8)
        px = [0] * (wid * hei)
        for b in range(n_blocks):
            coefs = [0] * 64
            for k in range(64):
                coefs[_JPEG_ZZ[k]] = coef[b][k]
            block = _jpeg_dequant_idct(coefs, qt)
            bx0 = (b % nbx) * 8
            by0 = (b // nbx) * 8
            for j in range(8):
                y = by0 + j
                if y >= hei:
                    break
                for i in range(8):
                    x = bx0 + i
                    if x >= wid:
                        break
                    px[y * wid + x] = block[j * 8 + i]
        return wid, hei, px
    except (ValueError, IndexError):
        return None


# ---------------------------------------------------------------------------
# Progressive JPEG, SUCCESSIVE APPROXIMATION (T.81 G.1.2.3): the
# canonical 4-scan script — DC and AC spectra at reduced precision
# first (point transform Al=1), then refinement scans that ship the
# final bit. Refinement AC coding is the intricate part: runs count
# only ZERO-HISTORY positions, and every already-nonzero coefficient
# passed on the walk carries one raw correction bit, interleaved in
# position order. Successive approximation transmits the SAME
# quantized coefficients as baseline, bit by bit — so decode is
# bit-identical to baseline, which the equality property test pins.
# ---------------------------------------------------------------------------


def _jpeg_ac_first_sa_block(w, zz, ac_codes) -> None:
    """AC first scan at Al=1 for one block: band coding (T.81
    G.1.2.2) over the point-transformed values trunc(v/2) — shared
    by the grayscale and color successive-approximation encoders."""
    run = 0
    for k in range(1, 64):
        v = zz[k]
        t = -((-v) >> 1) if v < 0 else v >> 1
        if t == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]
            w.put(code, length)
            run -= 16
        size, bits = _jpeg_mag_bits(t)
        length, code = ac_codes[(run << 4) | size]
        w.put(code, length)
        w.put(bits, size)
        run = 0
    if run:
        length, code = ac_codes[0x00]
        w.put(code, length)


def _jpeg_ac_refine_block(w, zz, ac_codes) -> None:
    """AC refinement scan (Ah=1, Al=0) for one block: T.81 G.1.2.3 —
    runs count ZERO-HISTORY positions only, every nonzero-history
    coefficient passed on the walk carries one correction bit in
    position order, end-of-band runs of exactly 1. Shared by the
    grayscale and color successive-approximation encoders."""
    events = []  # ordered: ("z",) zero-history zero | ("c", bit)
    for k in range(1, 64):
        v = zz[k]
        av = -v if v < 0 else v
        hist = av >> 1  # nonzero after the Al=1 scan?
        if hist:
            events.append(("c", av & 1))
        elif av == 0:
            events.append(("z",))
        else:  # newly nonzero: v is +-1
            # count pending zero-history zeros as the run
            while sum(1 for e in events if e[0] == "z") > 15:
                length, code = ac_codes[0xF0]
                w.put(code, length)
                zeros = 0
                rest = []
                for e in events:
                    if zeros == 16:
                        rest.append(e)
                    elif e[0] == "c":
                        w.put(e[1], 1)
                    else:
                        zeros += 1
                events = rest
            run = sum(1 for e in events if e[0] == "z")
            size, bits = _jpeg_mag_bits(v)  # (1, sign bit)
            length, code = ac_codes[(run << 4) | 1]
            w.put(code, length)
            w.put(bits, 1)
            for e in events:  # correction bits in walk order
                if e[0] == "c":
                    w.put(e[1], 1)
            events = []
    if events:  # rest of band: EOB (EOBRUN=1) + trailing bits
        length, code = ac_codes[0x00]
        w.put(code, length)
        for e in events:
            if e[0] == "c":
                w.put(e[1], 1)


def make_jpeg_gray_progressive_sa(
    width: int,
    height: int,
    value_of,
    qtable: list[int] | None = None,
) -> bytes:
    """Spec-valid PROGRESSIVE (SOF2) grayscale JFIF with SUCCESSIVE
    APPROXIMATION: scan 1 = DC at Al=1 (arithmetic-shift point
    transform, floor semantics per two's complement), scan 2 = AC
    1-63 at Al=1 (magnitude trunc), scan 3 = DC refinement (one raw
    bit per block, no Huffman), scan 4 = AC refinement (G.1.2.3:
    newly-nonzero +-1 coded as size-1 symbols whose runs count
    zero-history positions only, correction bits for nonzero-history
    coefficients appended in walk order, end-of-band runs of exactly
    1 so the Annex-K tables suffice)."""
    qt = list(qtable) if qtable is not None else list(_JPEG_STD_QT)
    dc_codes = _jpeg_build_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_build_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    blocks_zz = _jpeg_gray_blocks_zz(width, height, value_of, qt)
    seg = _jpeg_seg
    out = _jpeg_gray_headers(width, height, qt, 0xC2)
    # scan 1: DC first, Al=1 — differential coding of (dc >> 1);
    # DC point transform is an ARITHMETIC shift (floor), so the
    # refinement bit is literally bit 0 (two's complement OR).
    w = _JpegBitWriter()
    prev = 0
    for zz in blocks_zz:
        t = zz[0] >> 1
        size, bits = _jpeg_mag_bits(t - prev)
        prev = t
        length, code = dc_codes[size]
        w.put(code, length)
        if size:
            w.put(bits, size)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))  # Ah=0 Al=1
    out += w.flush()
    # scan 2: AC first, band 1-63, Al=1 — same band coding as
    # spectral selection on trunc(v/2) (AC point transform is
    # magnitude shift: truncation toward zero).
    w = _JpegBitWriter()
    for zz in blocks_zz:
        _jpeg_ac_first_sa_block(w, zz, ac_codes)
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
    out += w.flush()
    # scan 3: DC refinement — one raw bit (bit 0 of the DC) per block
    w = _JpegBitWriter()
    for zz in blocks_zz:
        w.put(zz[0] & 1, 1)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))  # Ah=1 Al=0
    out += w.flush()
    # scan 4: AC refinement (G.1.2.3), EOBRUN of exactly 1
    w = _JpegBitWriter()
    for zz in blocks_zz:
        _jpeg_ac_refine_block(w, zz, ac_codes)
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
    out += w.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# MULTI-COMPONENT progressive JPEG (4:4:4 color, spectral selection):
# per T.81, a progressive DC scan may interleave all components (one
# MCU loop, one predictor per component), but AC scans must be
# NON-INTERLEAVED — one component per scan, blocks in that
# component's own raster order. This is why color progressive files
# have scan scripts like [DC(YCbCr), AC(Y), AC(Cb), AC(Cr)]: exactly
# the script this encoder emits. Successive approximation for color
# remains the documented seam (the grayscale SA path shows the
# refinement machinery).
# ---------------------------------------------------------------------------


def make_jpeg_ycbcr_progressive(
    width: int,
    height: int,
    ycbcr_of,
    qtable_y: list[int] | None = None,
    qtable_c: list[int] | None = None,
) -> bytes:
    """Spec-valid PROGRESSIVE (SOF2) 4:4:4 color JFIF via spectral
    selection: scan 1 interleaves every component's DC coefficient
    (three independent predictors, Y/chroma DC tables), then one
    NON-INTERLEAVED AC scan per component covering band 1-63 with
    the component's AC table — the canonical color-progressive scan
    script. End-of-band runs are one block at a time, so the Annex-K
    tables suffice."""
    qty = list(qtable_y) if qtable_y is not None else list(_JPEG_STD_QT)
    qtc = (
        list(qtable_c)
        if qtable_c is not None
        else list(_JPEG_STD_QT_CHROMA)
    )
    dc0 = _jpeg_build_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac0 = _jpeg_build_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    dc1 = _jpeg_build_codes(_JPEG_DC_BITS_CHROMA, _JPEG_DC_VALS_CHROMA)
    ac1 = _jpeg_build_codes(_JPEG_AC_BITS_CHROMA, _JPEG_AC_VALS_CHROMA)
    comp_tabs = [(qty, dc0, ac0), (qtc, dc1, ac1), (qtc, dc1, ac1)]
    # per-component zigzag coefficient arrays, component raster order
    blocks = [[], [], []]
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            pix = [
                ycbcr_of(min(bx + i, width - 1), min(by + j, height - 1))
                for j in range(8)
                for i in range(8)
            ]
            for ci, (qt, _dc, _ac) in enumerate(comp_tabs):
                q = _jpeg_fdct_quant([p[ci] & 0xFF for p in pix], qt)
                blocks[ci].append([q[_JPEG_ZZ[k]] for k in range(64)])
    import struct

    seg = _jpeg_seg
    out = bytearray(b"\xff\xd8")
    out += seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    out += seg(
        0xDB,
        bytes([0x00]) + bytes(qty[_JPEG_ZZ[k]] for k in range(64))
        + bytes([0x01]) + bytes(qtc[_JPEG_ZZ[k]] for k in range(64)),
    )
    out += seg(
        0xC2,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
        + bytes([0x01]) + bytes(_JPEG_DC_BITS_CHROMA)
        + bytes(_JPEG_DC_VALS_CHROMA)
        + bytes([0x11]) + bytes(_JPEG_AC_BITS_CHROMA)
        + bytes(_JPEG_AC_VALS_CHROMA),
    )
    # scan 1: interleaved DC (Ns=3), full precision
    w = _JpegBitWriter()
    prev = [0, 0, 0]
    n_blocks = len(blocks[0])
    for b in range(n_blocks):
        for ci, (_qt, dcc, _ac) in enumerate(comp_tabs):
            v = blocks[ci][b][0]
            size, bits = _jpeg_mag_bits(v - prev[ci])
            prev[ci] = v
            length, code = dcc[size]
            w.put(code, length)
            if size:
                w.put(bits, size)
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0]))
    out += w.flush()
    # scans 2-4: one NON-interleaved AC band scan per component
    for ci, (_qt, _dc, acc) in enumerate(comp_tabs):
        w = _JpegBitWriter()
        for zz in blocks[ci]:
            run = 0
            for k in range(1, 64):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    length, code = acc[0xF0]
                    w.put(code, length)
                    run -= 16
                size, bits = _jpeg_mag_bits(zz[k])
                length, code = acc[(run << 4) | size]
                w.put(code, length)
                w.put(bits, size)
                run = 0
            if run:
                length, code = acc[0x00]
                w.put(code, length)
        tds = 0x00 if ci == 0 else 0x11
        out += seg(0xDA, bytes([1, ci + 1, tds, 1, 63, 0]))
        out += w.flush()
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_ycbcr_progressive(
    payload: bytes,
) -> tuple[int, int, list[int], list[int], list[int]] | None:
    """(width, height, Y, Cb, Cr planes) from a PROGRESSIVE (SOF2)
    4:4:4 color JFIF with spectral selection: an interleaved DC scan
    (Ns=3, one predictor per component) plus non-interleaved AC band
    scans (Ns=1, general EOBn). None at the documented seam:
    successive approximation for color, chroma-subsampled
    progressive, progressive restart intervals, and malformed
    streams."""
    try:
        if len(payload) < 4 or payload[:2] != b"\xff\xd8":
            return None
        qtables: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], dict] = {}
        wid = hei = None
        comp_order: list[int] = []
        comp_qt: dict[int, int] = {}
        coef: dict[int, list[list[int]]] = {}
        n_blocks = 0
        pos = 2
        while pos + 2 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker == 0xD9:
                break
            if pos + 4 > len(payload):
                return None
            seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
            body = payload[pos + 4 : pos + 2 + seg_len]
            if len(body) != seg_len - 2:
                return None
            if marker == 0xDB:
                b = 0
                while b < len(body):
                    pq, tq = body[b] >> 4, body[b] & 0x0F
                    if pq != 0 or b + 65 > len(body):
                        return None
                    zz = list(body[b + 1 : b + 65])
                    qt = [0] * 64
                    for k in range(64):
                        qt[_JPEG_ZZ[k]] = zz[k]
                    qtables[tq] = qt
                    b += 65
            elif marker == 0xC4:
                b = 0
                while b + 17 <= len(body):
                    tc, th = body[b] >> 4, body[b] & 0x0F
                    bits = list(body[b + 1 : b + 17])
                    n = sum(bits)
                    vals = list(body[b + 17 : b + 17 + n])
                    if len(vals) != n:
                        return None
                    table = {}
                    code = 0
                    k = 0
                    for length in range(1, 17):
                        for _ in range(bits[length - 1]):
                            table[(length, code)] = vals[k]
                            code += 1
                            k += 1
                        code <<= 1
                    huff[(tc, th)] = table
                    b += 17 + n
            elif marker == 0xC2:
                if body[0] != 8 or body[5] != 3:
                    return None  # this decoder: 3-component only
                hei = int.from_bytes(body[1:3], "big")
                wid = int.from_bytes(body[3:5], "big")
                if wid == 0 or hei == 0:
                    return None
                for c in range(3):
                    cid = body[6 + 3 * c]
                    if body[7 + 3 * c] != 0x11:
                        return None  # subsampled progressive: seam
                    comp_order.append(cid)
                    comp_qt[cid] = body[8 + 3 * c]
                n_blocks = (-(-wid // 8)) * (-(-hei // 8))
                for cid in comp_order:
                    coef[cid] = [[0] * 64 for _ in range(n_blocks)]
            elif marker in (0xC0, 0xC1, 0xC3, 0xC9, 0xCA, 0xCB):
                return None
            elif marker == 0xDD:
                return None  # progressive restart: seam
            elif marker == 0xDA:
                if not coef:
                    return None
                ns = body[0]
                scan_comps = []
                for c in range(ns):
                    scan_comps.append(
                        (body[1 + 2 * c], body[2 + 2 * c])
                    )
                ss = body[1 + 2 * ns]
                se = body[2 + 2 * ns]
                ah = body[3 + 2 * ns] >> 4
                al = body[3 + 2 * ns] & 0x0F
                if ah and ah != al + 1:
                    return None  # refinement must narrow one bit
                p1 = 1 << al
                reader = _JpegBitReader(payload, pos + 2 + seg_len)
                if ss == 0:
                    # DC scan: interleaved over all components
                    if se != 0 or ns != 3:
                        return None
                    if ah == 0:
                        dcs = {}
                        for cid, tds in scan_comps:
                            dc = huff.get((0, tds >> 4))
                            if dc is None or cid not in coef:
                                return None
                            dcs[cid] = dc
                        prev = {cid: 0 for cid, _ in scan_comps}
                        for b in range(n_blocks):
                            for cid, _tds in scan_comps:
                                size = _jpeg_decode_symbol(
                                    reader, dcs[cid]
                                )
                                prev[cid] += _jpeg_extend(
                                    reader.bits(size), size
                                )
                                coef[cid][b][0] = prev[cid] << al
                    else:
                        # DC refinement: interleaved raw bits
                        for b in range(n_blocks):
                            for cid, _tds in scan_comps:
                                if cid not in coef:
                                    return None
                                if reader.bit():
                                    coef[cid][b][0] |= p1
                else:
                    # AC scan: spec requires non-interleaved (Ns=1)
                    if ns != 1 or ss > se or se > 63:
                        return None
                    cid, tds = scan_comps[0]
                    ac = huff.get((1, tds & 0x0F))
                    if ac is None or cid not in coef:
                        return None
                    cfs = coef[cid]
                    if ah:
                        # AC refinement: shared G.1.2.3 walk
                        if not _jpeg_ac_refine_scan_decode(
                            reader, ac, cfs, n_blocks, ss, se, p1
                        ):
                            return None
                    else:
                        eobrun = 0
                        for b in range(n_blocks):
                            if eobrun:
                                eobrun -= 1
                                continue
                            k = ss
                            while k <= se:
                                rs = _jpeg_decode_symbol(reader, ac)
                                r, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    eobrun = (1 << r) - 1
                                    if r:
                                        eobrun += reader.bits(r)
                                    break
                                k += r
                                if k > se:
                                    return None
                                cfs[b][k] = (
                                    _jpeg_extend(reader.bits(s), s) << al
                                )
                                k += 1
                pos = reader.pos
                continue
            pos += 2 + seg_len
        else:
            return None
        if not coef or wid is None:
            return None
        nbx = -(-wid // 8)
        planes = []
        for cid in comp_order:
            qt = qtables.get(comp_qt[cid])
            if qt is None:
                return None
            px = [0] * (wid * hei)
            for b in range(n_blocks):
                coefs = [0] * 64
                for k in range(64):
                    coefs[_JPEG_ZZ[k]] = coef[cid][b][k]
                block = _jpeg_dequant_idct(coefs, qt)
                bx0 = (b % nbx) * 8
                by0 = (b // nbx) * 8
                for j in range(8):
                    y = by0 + j
                    if y >= hei:
                        break
                    for i in range(8):
                        x = bx0 + i
                        if x >= wid:
                            break
                        px[y * wid + x] = block[j * 8 + i]
            planes.append(px)
        return wid, hei, planes[0], planes[1], planes[2]
    except (ValueError, IndexError):
        return None


def make_jpeg_ycbcr_progressive_sa(
    width: int,
    height: int,
    ycbcr_of,
    qtable_y: list[int] | None = None,
    qtable_c: list[int] | None = None,
) -> bytes:
    """PROGRESSIVE (SOF2) 4:4:4 color JFIF with SUCCESSIVE
    APPROXIMATION — the full 8-scan color script: interleaved DC at
    Al=1, three per-component AC first scans at Al=1, an interleaved
    raw-bit DC refinement, and three per-component G.1.2.3 AC
    refinement scans (the shared _jpeg_ac_first_sa_block /
    _jpeg_ac_refine_block coders, one per component with its own
    Huffman pair)."""
    qty = list(qtable_y) if qtable_y is not None else list(_JPEG_STD_QT)
    qtc = (
        list(qtable_c)
        if qtable_c is not None
        else list(_JPEG_STD_QT_CHROMA)
    )
    dc0 = _jpeg_build_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac0 = _jpeg_build_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    dc1 = _jpeg_build_codes(_JPEG_DC_BITS_CHROMA, _JPEG_DC_VALS_CHROMA)
    ac1 = _jpeg_build_codes(_JPEG_AC_BITS_CHROMA, _JPEG_AC_VALS_CHROMA)
    comp_tabs = [(qty, dc0, ac0), (qtc, dc1, ac1), (qtc, dc1, ac1)]
    blocks = [[], [], []]
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            pix = [
                ycbcr_of(min(bx + i, width - 1), min(by + j, height - 1))
                for j in range(8)
                for i in range(8)
            ]
            for ci, (qt, _dc, _ac) in enumerate(comp_tabs):
                q = _jpeg_fdct_quant([p[ci] & 0xFF for p in pix], qt)
                blocks[ci].append([q[_JPEG_ZZ[k]] for k in range(64)])
    import struct

    seg = _jpeg_seg
    out = bytearray(b"\xff\xd8")
    out += seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    out += seg(
        0xDB,
        bytes([0x00]) + bytes(qty[_JPEG_ZZ[k]] for k in range(64))
        + bytes([0x01]) + bytes(qtc[_JPEG_ZZ[k]] for k in range(64)),
    )
    out += seg(
        0xC2,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
        + bytes([0x01]) + bytes(_JPEG_DC_BITS_CHROMA)
        + bytes(_JPEG_DC_VALS_CHROMA)
        + bytes([0x11]) + bytes(_JPEG_AC_BITS_CHROMA)
        + bytes(_JPEG_AC_VALS_CHROMA),
    )
    n_blocks = len(blocks[0])
    # scan 1: interleaved DC first, Al=1 (arithmetic-shift transform)
    w = _JpegBitWriter()
    prev = [0, 0, 0]
    for b in range(n_blocks):
        for ci, (_qt, dcc, _ac) in enumerate(comp_tabs):
            t = blocks[ci][b][0] >> 1
            size, bits = _jpeg_mag_bits(t - prev[ci])
            prev[ci] = t
            length, code = dcc[size]
            w.put(code, length)
            if size:
                w.put(bits, size)
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0x01]))
    out += w.flush()
    # scans 2-4: per-component AC first, Al=1
    for ci, (_qt, _dc, acc) in enumerate(comp_tabs):
        w = _JpegBitWriter()
        for zz in blocks[ci]:
            _jpeg_ac_first_sa_block(w, zz, acc)
        tds = 0x00 if ci == 0 else 0x11
        out += seg(0xDA, bytes([1, ci + 1, tds, 1, 63, 0x01]))
        out += w.flush()
    # scan 5: interleaved DC refinement — one raw bit per component
    w = _JpegBitWriter()
    for b in range(n_blocks):
        for ci in range(3):
            w.put(blocks[ci][b][0] & 1, 1)
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0x10]))
    out += w.flush()
    # scans 6-8: per-component AC refinement (G.1.2.3)
    for ci, (_qt, _dc, acc) in enumerate(comp_tabs):
        w = _JpegBitWriter()
        for zz in blocks[ci]:
            _jpeg_ac_refine_block(w, zz, acc)
        tds = 0x00 if ci == 0 else 0x11
        out += seg(0xDA, bytes([1, ci + 1, tds, 1, 63, 0x10]))
        out += w.flush()
    out += b"\xff\xd9"
    return bytes(out)
