"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side architecture is real and tested — schemas, batch
iteration, partition sizing. Codec status: WAV (RIFF), PNG (zlib IDAT
+ CRC chunks), BMP (dual headers/palette/stride), and JPEG
(baseline-sequential T.81: Huffman + dequant + IDCT, r7) are REAL,
implemented on the stdlib and round-trip verified (see the
real-container section at the bottom; PNG/JPEG also interop-proven
against javax.imageio), and VIDEO ships as MJPEG-in-AVI (r7: a real
RIFF container whose frames run the full baseline JPEG decoder).
Only foreign codecs (H.264 etc. — ffmpeg territory) and the
arbitrary-format fallbacks remain STUBBED: ``decode_fn=None`` uses a
deterministic fake decoder, and passing ``strict=True`` raises
NotImplementedError exactly where a real media library would plug in.

Scale notes: media payloads dominate row size, so
  * metadata extraction projects ONLY the binary column (column pruning
    keeps other columns out of the Arrow transfer);
  * mapInPandas streams per-batch — no per-row Python overhead, and
    spark.sql.execution.arrow.maxRecordsPerBatch bounds memory per task;
  * for very large blobs, store pointers (path + offset) in the table
    and fetch lazily inside the batch iterator — same operator shape.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, format string, width int, height int, "
    "channels int, checksum bigint"
)


def attach_fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Manufacture a deterministic binary payload column from text (the
    fixtures carry no media; this stands in for reading real bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def _fake_decode(payload: bytes) -> dict:
    """Deterministic fake 'image decode': dimensions derived from the
    byte stream. Replace with PIL.Image.open in a real deployment."""
    n = len(payload)
    crc = zlib.crc32(payload)
    return {
        "format": ("png", "jpeg", "webp")[crc % 3],
        "width": 64 + (crc % 512),
        "height": 64 + ((crc >> 9) % 512),
        "channels": 3,
        "checksum": crc,
        "n_bytes": n,
    }


def extract_image_metadata(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """Decode image metadata from a binary column via mapInPandas.

    ``strict=True`` raises NotImplementedError (no media libs in this
    container) — the marked plug-in point for a real decoder.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real image decoding requires PIL/opencv on the executors; "
                "install and replace _fake_decode"
            )
        for pdf in batches:
            metas = [_fake_decode(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out[
                ["doc_id", "n_bytes", "format", "width", "height", "channels", "checksum"]
            ]

    return df.select(id_col, payload_col).mapInPandas(
        decode_batches, schema=IMAGE_META_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = "doc_id bigint, frame_idx int, frame_checksum bigint"


def _frame_checksum(chunk: bytes) -> int:
    """60-bit md5 over the frame's uppercase-hex byte representation.

    Hashing the hex form (not the raw bytes) is deliberate: SQL engines
    can reproduce it without blob-slicing support — DuckDB computes the
    identical value as CAST('0x'||substr(md5(substring(hex(blob), 2i+1,
    2n)),1,15) AS BIGINT) — so the fan-out output is oracle-checkable.
    """
    import hashlib

    return int(hashlib.md5(chunk.hex().upper().encode()).hexdigest()[:15], 16)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n_bytes: int = 64,
) -> DataFrame:
    """'Video' frame sampling stub: emits one row per sampled frame
    (1→N mapInPandas fan-out — the real shape of a frame extractor).
    Deterministic fake: a frame per every_n_bytes window, checksummed."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(p)
                for i in range(0, max(len(b), 1), every_n_bytes):
                    ids.append(doc_id)
                    idxs.append(i // every_n_bytes)
                    sums.append(_frame_checksum(b[i : i + every_n_bytes]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_checksum": sums}
            )

    return df.select(id_col, payload_col).mapInPandas(
        frames, schema=FRAME_SAMPLE_SCHEMA
    )


AUDIO_FEATURE_SCHEMA = (
    "doc_id bigint, window_idx int, n_samples int, energy bigint, peak int"
)


def extract_audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    window: int = 64,
    strict: bool = False,
) -> DataFrame:
    """'Audio' feature extraction stub: treat each payload byte as one
    centered PCM sample (b - 128) and emit per-window energy (sum of
    squared samples) and peak amplitude — the windowed-feature fan-out
    shape of a real audio featurizer (RMS/spectral frames), 1→N via
    Arrow-batched mapInPandas.

    ``strict=True`` raises NotImplementedError where a real decoder
    (soundfile/ffmpeg) would plug in. The fake decode is byte-exact, so
    the whole fan-out is oracle-checkable: DuckDB reproduces every
    sample as CAST('0x' || substr(hex(payload), 2i-1, 2) AS INT) - 128.
    All outputs are integers — no float reduction anywhere.
    """
    import numpy as np

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real audio decoding requires soundfile/ffmpeg on the "
                "executors; install and replace the byte-sample fake"
            )
        for pdf in batches:
            ids, idxs, ns, es, ps = [], [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                arr = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64) - 128
                for w in range(0, len(arr), window):
                    chunk = arr[w : w + window]
                    ids.append(doc_id)
                    idxs.append(w // window)
                    ns.append(len(chunk))
                    es.append(int((chunk * chunk).sum()))
                    ps.append(int(np.abs(chunk).max()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(idxs, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "energy": pd.Series(es, dtype="int64"),
                    "peak": pd.Series(ps, dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        features, schema=AUDIO_FEATURE_SCHEMA
    )


RESIZE_SCHEMA = (
    "doc_id bigint, n_bytes int, stride int, out_n_bytes int,"
    " out_checksum bigint"
)


def resize_payloads(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_bytes: int = 256,
    strict: bool = False,
) -> DataFrame:
    """'Resize' a binary media column to a byte budget — the 1→1
    binary-in/binary-out transform shape of a real thumbnailer
    (PIL resize / ffmpeg scale), with the same Arrow-batched
    mapInPandas plumbing, schema, and batch flow.

    The stand-in kernel is deterministic stride sampling (every k-th
    byte, k = ceil(n/max_bytes)) so the output is fully
    oracle-checkable: DuckDB reproduces the sampled byte stream from
    hex(payload) and the same 60-bit md5 checksum the frame sampler
    uses. ``strict=True`` raises at the marked plug-in point where a
    real codec would go. Only (id, payload) cross the Arrow boundary.
    """

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real image resizing requires PIL/opencv on the executors; "
                "install and replace the stride-sampling kernel"
            )
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(p)
                n = len(b)
                stride = max(1, -(-n // max_bytes))
                out = b[::stride]
                rows.append(
                    (did, n, stride, len(out), _frame_checksum(out))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "stride", "out_n_bytes",
                    "out_checksum",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        do, schema=RESIZE_SCHEMA
    )


AHASH_SCHEMA = "doc_id bigint, ahash bigint"


def image_ahash(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """64-bit average-hash (aHash) per image payload — the perceptual
    fingerprint behind image dedup: bit i is set iff pixel i is brighter
    than the image mean, so re-encoded/slightly-edited copies land
    within a small hamming ball while distinct images scatter.

    The stand-in kernel reads the first min(64, n) payload bytes as the
    8x8 grayscale (a real pipeline decodes + resizes to 8x8 first —
    ``strict=True`` raises at that plug-in point); mean uses FLOOR
    integer division and the strict '>' comparison so the bit pattern is
    integer-exact and DuckDB can reproduce every signature from
    hex(payload) for oracle checking. Output is the SIGNED int64 with
    bit i at position i (two's complement when bit 63 is set) — the
    layout hamming_neardup_pairs expects.
    """
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real aHash requires image decode + 8x8 resize "
                "(PIL/opencv) on the executors; install and replace the "
                "leading-bytes fake"
            )
        for pdf in batches:
            ids, hashes = [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None or len(p) == 0:
                    # no pixels → no signature; a NULL hash joins no
                    # band bucket, so empty media never pairs (matches
                    # the oracle, where the empty-list fold yields NULL)
                    ids.append(did)
                    hashes.append(None)
                    continue
                b = np.frombuffer(bytes(p)[:64], dtype=np.uint8)
                m = int(b.sum()) // len(b)
                h = 0
                for i, x in enumerate(b):
                    if int(x) > m:
                        h |= 1 << i
                if h >= 1 << 63:
                    h -= 1 << 64
                ids.append(did)
                hashes.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "ahash": pd.array(hashes, dtype="Int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema=AHASH_SCHEMA
    )


# --- Real-container codecs (stdlib) -----------------------------------
#
# The PIL/ffmpeg decode paths stay environment-gated (strict=True above),
# but two REAL media containers are fully implementable with the
# standard library, so those paths run genuine encode→decode round
# trips rather than stand-ins:
#   * WAV  — RIFF/WAVE via the `wave` module (real container parser);
#   * PNG  — 8-bit grayscale, zlib-compressed IDAT with CRC-verified
#            chunks (real compression, real chunk grammar).
# Payloads are the deterministic fixture bytes, so after decode the PCM
# frames / pixel bytes EQUAL the payload (plus known padding) — which is
# exactly what makes every decoded feature oracle-checkable from
# hex(payload) in SQL while the codec itself genuinely runs.

WAV_META_SCHEMA = (
    "doc_id bigint, sample_rate int, n_frames bigint, "
    "container_bytes bigint, energy bigint, peak int"
)


def wav_encode(payload: bytes, sample_rate: int = 8000) -> bytes:
    """Wrap raw bytes as genuine 8-bit mono PCM WAV (RIFF container)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(sample_rate)
        w.writeframes(payload)
    return buf.getvalue()


def wav_decode(container: bytes) -> tuple[int, int, bytes]:
    """Parse a WAV container; returns (sample_rate, n_frames, pcm)."""
    import io
    import wave

    with wave.open(io.BytesIO(container), "rb") as r:
        if r.getnchannels() != 1 or r.getsampwidth() != 1:
            raise ValueError("expected 8-bit mono PCM")
        return r.getframerate(), r.getnframes(), r.readframes(r.getnframes())


def extract_wav_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    sample_rate: int = 8000,
) -> DataFrame:
    """Whole-clip audio features through a REAL WAV round trip: each
    payload is encoded into a RIFF/WAVE container and decoded back with
    the stdlib `wave` parser inside the Arrow batch kernel; features
    (integer energy/peak over centered samples) are computed from the
    DECODED frames. Complements extract_audio_features (windowed
    fan-out over raw bytes) by exercising the container layer."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                container = wav_encode(bytes(p), sample_rate)
                rate, n, pcm = wav_decode(container)
                # vectorized feature math over the decoded frames
                # (guide §4.2: a per-byte Python loop here dominated
                # the kernel); int64 accumulation keeps energy exact
                s = np.frombuffer(pcm, dtype=np.uint8).astype(
                    np.int64
                ) - 128
                rows.append(
                    (
                        doc_id,
                        rate,
                        n,
                        len(container),
                        int((s * s).sum()) if s.size else 0,
                        int(np.abs(s).max()) if s.size else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "sample_rate",
                    "n_frames",
                    "container_bytes",
                    "energy",
                    "peak",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        feats, schema=WAV_META_SCHEMA
    )


PNG_META_SCHEMA = (
    "doc_id bigint, width int, height int, n_pad int, "
    "mean_pixel_ppm bigint, px_checksum bigint"
)


def png_encode(payload: bytes, width: int = 32) -> bytes:
    """Encode raw bytes as a genuine 8-bit grayscale PNG: row-major
    pixels padded with zeros to the last scanline, filter type 0 per
    scanline, one zlib-compressed IDAT, CRC32 on every chunk."""
    import struct

    h = max(1, (len(payload) + width - 1) // width)
    padded = payload.ljust(width * h, b"\x00")
    raw = b"".join(
        b"\x00" + padded[r * width : (r + 1) * width] for r in range(h)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def png_decode(container: bytes) -> tuple[int, int, bytes]:
    """Parse a PNG (signature, chunk grammar, CRC verification), inflate
    IDAT, strip per-scanline filter bytes (type 0 only). Returns
    (width, height, pixel_bytes)."""
    import struct

    if container[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, w, h = 8, b"", None, None
    while pos < len(container):
        if pos + 12 > len(container):
            raise ValueError("truncated chunk header")
        (ln,) = struct.unpack(">I", container[pos : pos + 4])
        if pos + 12 + ln > len(container):
            raise ValueError("truncated chunk payload")
        tag = container[pos + 4 : pos + 8]
        data = container[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(
            ">I", container[pos + 8 + ln : pos + 12 + ln]
        )
        if crc != zlib.crc32(tag + data):
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", data[:10])
            if depth != 8 or ctype != 0:
                raise ValueError("expected 8-bit grayscale")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or h is None:
        raise ValueError("missing IHDR chunk")
    raw = zlib.decompress(idat)
    if len(raw) != h * (w + 1):
        raise ValueError("scanline size mismatch")
    px = b"".join(raw[r * (w + 1) + 1 : (r + 1) * (w + 1)] for r in range(h))
    for r in range(h):
        if raw[r * (w + 1)] != 0:
            raise ValueError("unsupported filter type")
    return w, h, px


def png_roundtrip_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    width: int = 32,
) -> DataFrame:
    """Image features through a REAL PNG round trip: encode each payload
    as a genuine zlib-compressed grayscale PNG, decode it back (CRC and
    grammar verified), then compute features from the DECODED pixels —
    dimensions, zero-padding count, integer mean-pixel ppm, and the
    portable hex-md5 checksum of the pixel bytes."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                w, h, px = png_decode(png_encode(bytes(p), width))
                rows.append(
                    (
                        doc_id,
                        w,
                        h,
                        w * h - len(bytes(p)),
                        sum(px) * 1_000_000 // (w * h),
                        _frame_checksum(px),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "n_pad",
                    "mean_pixel_ppm",
                    "px_checksum",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        feats, schema=PNG_META_SCHEMA
    )


BMP_META_SCHEMA = (
    "doc_id bigint, width int, height int, n_pad int, "
    "mean_pixel_ppm bigint, px_checksum bigint"
)


def bmp_encode(payload: bytes, width: int = 30) -> bytes:
    """Encode raw bytes as a genuine 8-bit palettized grayscale BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER + 256-entry BGRA palette),
    with the format's two real quirks intact: scanlines are stored
    BOTTOM-UP and padded to a 4-byte stride (width 30 -> stride 32, so
    the padding path is actually exercised, unlike a multiple-of-4
    width)."""
    import struct

    h = max(1, (len(payload) + width - 1) // width)
    padded = payload.ljust(width * h, b"\x00")
    stride = (width + 3) & ~3
    rows = [
        padded[r * width : (r + 1) * width].ljust(stride, b"\x00")
        for r in range(h)
    ]
    pixel_data = b"".join(reversed(rows))  # bottom-up
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    offset = 14 + 40 + len(palette)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, h, 1, 8, 0, len(pixel_data),
        2835, 2835, 256, 0,
    )
    file_header = struct.pack(
        "<2sIHHI", b"BM", offset + len(pixel_data), 0, 0, offset
    )
    return file_header + info + palette + pixel_data


def bmp_decode(container: bytes) -> tuple[int, int, bytes]:
    """Parse a BMP (magic, header sizes, 8-bit uncompressed, grayscale
    palette verified), undo the bottom-up row order and per-row stride
    padding. Returns (width, height, pixel_bytes)."""
    import struct

    if container[:2] != b"BM":
        raise ValueError("not a BMP")
    if len(container) < 54:
        raise ValueError("truncated header")
    _, fsize, _, _, offset = struct.unpack("<2sIHHI", container[:14])
    (
        hsize, width, height, planes, bitcount, compression,
        _img_size, _xppm, _yppm, ncolors, _imp,
    ) = struct.unpack("<IiiHHIIiiII", container[14:54])
    if hsize != 40 or planes != 1:
        raise ValueError("unsupported DIB header")
    if bitcount != 8 or compression != 0:
        raise ValueError("expected 8-bit uncompressed")
    if height <= 0:
        raise ValueError("expected bottom-up rows")
    pal = container[54 : 54 + 4 * (ncolors or 256)]
    for i in range(ncolors or 256):
        b, g, r = pal[4 * i], pal[4 * i + 1], pal[4 * i + 2]
        if not (b == g == r == i):
            raise ValueError("expected identity grayscale palette")
    stride = (width + 3) & ~3
    need = offset + stride * height
    if len(container) < need or fsize != need:
        raise ValueError("pixel data size mismatch")
    rows = [
        container[offset + r * stride : offset + r * stride + width]
        for r in range(height)
    ]
    return width, height, b"".join(reversed(rows))


def bmp_roundtrip_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    width: int = 30,
) -> DataFrame:
    """Image features through a REAL BMP round trip — same feature set
    as png_roundtrip_features but exercising the OTHER container
    grammar (little-endian headers, palette, bottom-up stride-padded
    rows instead of chunks+CRC+zlib)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                w, h, px = bmp_decode(bmp_encode(bytes(p), width))
                rows.append(
                    (
                        doc_id,
                        w,
                        h,
                        w * h - len(bytes(p)),
                        sum(px) * 1_000_000 // (w * h),
                        _frame_checksum(px),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "n_pad",
                    "mean_pixel_ppm",
                    "px_checksum",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        feats, schema=BMP_META_SCHEMA
    )


# -- JPEG (baseline sequential DCT, ITU-T T.81 / public JPEG spec) ------
#
# The fourth real container codec beside WAV/PNG/BMP, closing the last
# multimodal stand-in (VERDICT r6 item 7). The DECODER implements the
# full generic baseline-sequential grayscale path — segment grammar,
# DQT (8/16-bit), DHT canonical Huffman construction, SOS entropy
# decode with 0xFF00 unstuffing and DRI/RSTn restart handling, dequant,
# de-zigzag, separable float IDCT, level shift, clamp — so it reads any
# conformant baseline grayscale JFIF, not just our own. The ENCODER
# produces a spec-valid file whose decode is EXACTLY predictable: each
# payload byte becomes one FLAT 8x8 tile, so the only nonzero DCT
# coefficient is DC = 8*(v-128); with q_DC = 8 the quantized DC is
# v-128 with NO rounding loss, and the IDCT of a DC-only block is the
# flat value DC/8 — exact in IEEE. Lossy-format machinery, lossless by
# construction, which is what lets a SQL oracle rebuild every decoded
# pixel from hex(payload) (tests interop-prove both directions against
# the JVM's javax.imageio reference decoder/encoder).

JPEG_META_SCHEMA = (
    "doc_id bigint, width int, height int, n_pad_px int, "
    "mean_pixel_ppm bigint, px_checksum bigint"
)

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# minimal spec-valid canonical Huffman tables for OUR encoder (the
# decoder always builds tables from the file's own DHT, so nothing
# depends on these beyond the files we write): 12 DC categories at
# code length 5, EOB as the single AC symbol at length 2
_ENC_DC_BITS = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = [0x00]  # EOB


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical construction."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        # bulk append: accumulate into the int bit-buffer, emit whole
        # bytes (with 0xFF00 stuffing) — no per-bit Python loop
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            b = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


_ENC_DIFF_CACHE: dict | None = None


def _enc_diff_patterns() -> dict:
    """Fused (bits_value, bits_len) per DC diff in [-255, 255]: the DC
    category Huffman code + magnitude bits + the EOB code, precomputed
    once — the flat-tile encoder then writes ONE pattern per block
    instead of three (code lookup, magnitude, EOB), bit-identical by
    construction (same bits, same order)."""
    global _ENC_DIFF_CACHE
    if _ENC_DIFF_CACHE is None:
        dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
        eob_code, eob_len = _canonical_codes(
            _ENC_AC_BITS, _ENC_AC_VALS
        )[0x00]
        cache = {}
        for diff in range(-255, 256):
            cat = abs(diff).bit_length()
            v, ln = dc_codes[cat]
            if cat:
                mag = diff if diff >= 0 else diff + (1 << cat) - 1
                v = (v << cat) | (mag & ((1 << cat) - 1))
                ln += cat
            cache[diff] = ((v << eob_len) | eob_code, ln + eob_len)
        _ENC_DIFF_CACHE = cache
    return _ENC_DIFF_CACHE


def jpeg_encode(payload: bytes, blocks_per_row: int = 16) -> bytes:
    """Encode raw bytes as a genuine baseline-sequential grayscale JFIF:
    one flat 8x8 tile per byte (zero-byte tiles pad the last block row),
    real DQT/DHT/SOF0/SOS segments, Huffman-coded DC diffs with EOB'd
    AC runs, byte stuffing — decodable by any conformant JPEG decoder
    (javax.imageio verified) and EXACTLY lossless by construction."""
    import struct

    n = len(payload)
    nbr = max(1, (n + blocks_per_row - 1) // blocks_per_row)
    blocks = list(payload) + [0] * (blocks_per_row * nbr - n)
    w, h = 8 * blocks_per_row, 8 * nbr
    quant = [8] + [16] * 63  # q_DC=8 makes the flat-tile DC exact

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT: Pq=0 (8-bit), Tq=0, values in zigzag order
    zz = [0] * 64
    for i in range(64):
        zz[i] = quant[_ZIGZAG[i]]
    out += seg(0xFFDB, bytes([0x00]) + bytes(zz))
    # SOF0: 8-bit precision, 1 component, 1x1 sampling, quant table 0
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    # DHT: DC table 0 then AC table 0
    out += seg(
        0xFFC4,
        bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
        + bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS),
    )
    # SOS: 1 component, DC/AC table 0, full spectral selection
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    patterns = _enc_diff_patterns()
    bw = _BitWriter()
    write = bw.write
    pred = 0
    for v in blocks:
        dcq = v - 128  # quantized DC of a flat tile, exact
        bits, ln = patterns[dcq - pred]
        pred = dcq
        write(bits, ln)  # DC code + magnitude + EOB, fused
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                # rewind to the 0xFF: _fill is then IDEMPOTENT at a
                # marker (re-raises identically), which lets the fast
                # Huffman path prefetch 8 bits speculatively and fall
                # back to the buffered-residue walk when the prefetch
                # runs into the end of the entropy stream
                self.pos -= 1
                raise _MarkerHit(0xFF00 | nxt, self.pos)
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, k: int) -> int:
        # bulk read (marker-safe: _fill still inspects every byte)
        while self.nbits < k:
            self._fill()
        self.nbits -= k
        v = (self.acc >> self.nbits) & ((1 << k) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0


class _MarkerHit(Exception):
    def __init__(self, marker: int, at: int) -> None:
        self.marker = marker
        self.at = at


def _huff_decoder(bits: list[int], vals: list[int]):
    codes = _canonical_codes(bits, vals)
    table = {
        (length, code): sym for sym, (code, length) in codes.items()
    }
    # libjpeg's classic first-N-bits lookup: one 256-entry table
    # resolves every code of <= 8 bits (the overwhelming majority of
    # symbols in practice) with a single peek instead of a bit-by-bit
    # tree walk — the entropy decode is the JPEG hot loop
    fast: list = [None] * 256
    for sym, (code, length) in codes.items():
        if length <= 8:
            base = code << (8 - length)
            for suffix in range(1 << (8 - length)):
                fast[base | suffix] = (sym, length)

    def read(br: _BitReader) -> int:
        if br.nbits < 8:
            try:
                while br.nbits < 8:
                    br._fill()
            except (_MarkerHit, IndexError):
                # end of entropy stream mid-prefetch: the symbol may
                # still complete from the buffered residue (the walk
                # below); _fill is idempotent at a marker, so a later
                # genuine overrun re-raises identically
                pass
        if br.nbits >= 8:
            hit = fast[(br.acc >> (br.nbits - 8)) & 0xFF]
            if hit is not None:
                br.nbits -= hit[1]
                br.acc &= (1 << br.nbits) - 1
                return hit[0]
        code, length = 0, 0
        while length < 17:
            code = (code << 1) | br.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    return read


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _idct_cos():
    import math

    return [
        [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
        for x in range(8)
    ]


def jpeg_decode(container: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline-sequential GRAYSCALE JPEG: full segment
    grammar, canonical Huffman tables from the file's DHT, entropy
    decode with unstuffing + restart intervals, dequantize, de-zigzag,
    separable float IDCT (DC-only fast path), level shift, clamp.
    Returns (width, height, row-major pixel bytes). Raises ValueError
    on corrupt streams and NotImplementedError (with the production
    remedy) for progressive/color/12-bit variants."""
    import math
    import struct

    if container[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, list[int]] = {}
    dc_tabs: dict[int, object] = {}
    ac_tabs: dict[int, object] = {}
    w = h = None
    comp_q = dc_id = ac_id = 0
    restart = 0
    while pos < len(container):
        if container[pos] != 0xFF:
            raise ValueError("expected marker")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker id; conformant encoders use them for alignment, so
        # skip them instead of misreading 0xFFFF as a marker
        while pos + 1 < len(container) and container[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(container):
            raise ValueError("truncated JPEG (fill bytes run to EOF)")
        marker = 0xFF00 | container[pos + 1]
        pos += 2
        if marker == 0xFFD9:  # EOI
            break
        if marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7):
            raise NotImplementedError(
                "only baseline-sequential (SOF0) JPEG is supported; "
                "re-encode progressive/extended files or deploy a "
                "media library (Pillow/libjpeg) for the long tail"
            )
        (ln,) = struct.unpack(">H", container[pos : pos + 2])
        body = container[pos + 2 : pos + ln]
        if marker == 0xFFDB:  # DQT (possibly several tables per seg)
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                bp += 1
                if pq == 0:
                    vals = list(body[bp : bp + 64])
                    bp += 64
                else:
                    vals = [
                        struct.unpack(">H", body[bp + 2 * i : bp + 2 * i + 2])[0]
                        for i in range(64)
                    ]
                    bp += 128
                dq = [0] * 64
                for i in range(64):
                    dq[_ZIGZAG[i]] = vals[i]
                quant[tq] = dq
        elif marker == 0xFFC4:  # DHT (possibly several tables per seg)
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0x0F
                bits = list(body[bp + 1 : bp + 17])
                nv = sum(bits)
                vals = list(body[bp + 17 : bp + 17 + nv])
                bp += 17 + nv
                (dc_tabs if tc == 0 else ac_tabs)[th] = _huff_decoder(
                    bits, vals
                )
        elif marker == 0xFFC0:  # SOF0
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(
                    "only 8-bit precision is supported (12-bit needs a "
                    "media library)"
                )
            if nc != 1:
                raise NotImplementedError(
                    "only grayscale (1-component) JPEG is supported; "
                    "YCbCr decode + upsampling belongs to a media "
                    "library (Pillow/libjpeg)"
                )
            if body[7] != 0x11:
                raise NotImplementedError("subsampling on 1 component")
            comp_q = body[8]
        elif marker == 0xFFDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xFFDA:  # SOS — entropy-coded data follows
            dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
            pos += ln
            break
        pos += ln
    if w is None or h is None:
        raise ValueError("missing SOF0")
    q = quant[comp_q]
    read_dc, read_ac = dc_tabs[dc_id], ac_tabs[ac_id]
    bw, bh = (w + 7) // 8, (h + 7) // 8
    cosx = _idct_cos()
    c = [1 / math.sqrt(2)] + [1.0] * 7
    px = bytearray(w * h)
    br = _BitReader(container, pos)
    try:
        _decode_scan(
            container, br, read_dc, read_ac, q, restart,
            bw, bh, w, h, cosx, c, px,
        )
    except _MarkerHit as mh:
        # a truncated/corrupt entropy stream whose Huffman walk runs
        # into a marker must surface as the documented ValueError, not
        # the internal signal exception
        raise ValueError(
            "entropy stream truncated / hit marker "
            f"0x{mh.marker:04X} at byte {mh.at}"
        ) from None
    except IndexError:
        raise ValueError("entropy stream truncated (ran past EOF)") from None
    return w, h, bytes(px)


def _decode_scan(
    container, br, read_dc, read_ac, q, restart, bw, bh, w, h, cosx, c, px
):
    """Baseline-sequential scan decode (the MCU loop of jpeg_decode,
    split out so the caller can normalize internal signal exceptions)."""
    pred = 0
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart and mcu and mcu % restart == 0:
                br.align()
                if (
                    container[br.pos] == 0xFF
                    and 0xD0 <= container[br.pos + 1] <= 0xD7
                ):
                    br.pos += 2
                    pred = 0
                else:
                    raise ValueError("missing restart marker")
            mcu += 1
            t = read_dc(br)
            diff = _extend(br.bits(t), t) if t else 0
            pred += diff
            # the 64-entry block is allocated only when a NONZERO AC
            # coefficient actually appears — the common all-flat block
            # (DC + immediate EOB) then costs two Huffman reads and a
            # slice fill, no list build and no 63-entry zero scan
            coef = None
            k = 1
            while k < 64:
                rs = read_ac(br)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL: 16 zeros
                    k += 16
                    continue
                k += rs >> 4
                size = rs & 0x0F
                if k > 63:
                    raise ValueError("AC run exceeds block")
                v = _extend(br.bits(size), size) * q[_ZIGZAG[k]]
                if v:
                    if coef is None:
                        coef = [0] * 64
                    coef[_ZIGZAG[k]] = v
                k += 1
            if coef is None:
                # DC-only fast path: IDCT of a DC-only block is flat;
                # fill by row SLICES, not per-pixel assignments
                val = pred * q[0] / 8.0 + 128.0
                b = min(255, max(0, int(val + 0.5)))
                span = min(8, w - bx * 8)
                row = bytes([b]) * span
                row0 = (by * 8) * w + bx * 8
                for y in range(min(8, h - by * 8)):
                    base = row0 + y * w
                    px[base : base + span] = row
                continue
            coef[0] = pred * q[0]
            # separable 2-pass IDCT
            tmp = [[0.0] * 8 for _ in range(8)]
            for y in range(8):
                for x in range(8):
                    s = 0.0
                    for u in range(8):
                        s += c[u] * coef[y * 8 + u] * cosx[x][u]
                    tmp[y][x] = s / 2.0
            for x in range(8):
                for y in range(8):
                    s = 0.0
                    for v2 in range(8):
                        s += c[v2] * tmp[v2][x] * cosx[y][v2]
                    val = s / 2.0 + 128.0
                    if by * 8 + y < h and bx * 8 + x < w:
                        px[(by * 8 + y) * w + bx * 8 + x] = min(
                            255, max(0, int(val + 0.5))
                        )


def jpeg_roundtrip_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    blocks_per_row: int = 16,
) -> DataFrame:
    """Image features through a REAL JPEG round trip — the same feature
    set as png/bmp_roundtrip_features, but through the DCT container:
    encode each payload as flat-tile baseline JFIF, run the full
    baseline decoder (Huffman, dequant, IDCT), and compute features
    from the DECODED pixels. n_pad_px counts the pad-tile pixels."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                w, h, px = jpeg_decode(jpeg_encode(raw, blocks_per_row))
                rows.append(
                    (
                        doc_id,
                        w,
                        h,
                        w * h - 64 * len(raw),
                        sum(px) * 1_000_000 // (w * h),
                        _frame_checksum(px),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "n_pad_px",
                    "mean_pixel_ppm",
                    "px_checksum",
                ],
            )

    # Python-heavy kernel: spread the docs over every core before the
    # Arrow boundary (a narrow file-split layout would serialize the
    # codec work onto a few tasks)
    src = df.select(id_col, payload_col)
    src = src.repartition(src.sparkSession.sparkContext.defaultParallelism)
    return src.mapInPandas(feats, schema=JPEG_META_SCHEMA)


# -- MJPEG-in-AVI (RIFF container, public Microsoft AVI spec) -----------
#
# The video member of the codec family: a real RIFF 'AVI ' container
# (hdrl with MainAVIHeader + one 'vids'/'MJPG' stream, movi with one
# '00dc' chunk per frame, idx1) whose frames are the r7 baseline JPEGs.
# Frame extraction therefore runs the FULL real path — container
# grammar, per-frame entropy decode, IDCT — and stays exactly
# predictable (flat tiles), so a SQL oracle can rebuild every decoded
# frame pixel. This retires the last video stand-in: sample_frames'
# fake checksum windows remain only as the lightweight fixture shape.

AVI_FRAME_BYTES = 64  # one 64x64 flat-tile JPEG per 64 payload bytes


def _fourcc(tag: bytes, body: bytes) -> bytes:
    import struct

    pad = b"\x00" if len(body) % 2 else b""  # RIFF chunks word-align
    return tag + struct.pack("<I", len(body)) + body + pad


def avi_encode_mjpeg(frames: list[bytes], width: int, height: int) -> bytes:
    """Pack pre-encoded JPEG frames into a spec-valid AVI: RIFF
    grammar, MainAVIHeader, one MJPG video stream header +
    BITMAPINFOHEADER, movi '00dc' chunks (word-aligned), idx1."""
    import struct

    avih = struct.pack(
        "<14I",
        40000,  # dwMicroSecPerFrame (25 fps)
        0, 0, 0x10,  # maxbytes, padding, AVIF_HASINDEX
        len(frames), 0, 1,  # totalframes, initialframes, streams
        max((len(f) for f in frames), default=0),
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<I2HI", 0, 0, 0, 0)  # flags, prio, lang, initial
        + struct.pack("<6I", 1, 25, 0, len(frames), 0, 0xFFFFFFFF)
        + struct.pack("<I4H", 0, 0, 0, width, height)
    )
    strf = struct.pack(
        "<I2i2H4s5I",
        40, width, height, 1, 24, b"MJPG", width * height * 3,
        0, 0, 0, 0,
    )
    hdrl = _fourcc(
        b"LIST",
        b"hdrl"
        + _fourcc(b"avih", avih)
        + _fourcc(b"LIST", b"strl" + _fourcc(b"strh", strh)
                  + _fourcc(b"strf", strf)),
    )
    movi_body = b"movi"
    offsets = []
    for f in frames:
        offsets.append(len(movi_body))  # offset of the 00dc tag
        movi_body += _fourcc(b"00dc", f)
    movi = _fourcc(b"LIST", movi_body)
    import struct as _s

    idx = b"".join(
        b"00dc" + _s.pack("<3I", 0x10, off, len(frames[i]))
        for i, off in enumerate(offsets)
    )
    riff_body = b"AVI " + hdrl + movi + _fourcc(b"idx1", idx)
    return _fourcc(b"RIFF", riff_body)


def avi_decode_mjpeg(container: bytes) -> tuple[int, int, list[bytes]]:
    """Walk a RIFF AVI: verify the grammar, read dimensions from
    MainAVIHeader, collect the '00dc'/'00db' frame chunks from the
    movi LIST. Returns (width, height, jpeg_frames). Raises ValueError
    on corrupt containers and NotImplementedError (with remedy) for
    non-MJPG streams."""
    import struct

    if container[:4] != b"RIFF" or container[8:12] != b"AVI ":
        raise ValueError("not a RIFF AVI container")
    (riff_len,) = struct.unpack("<I", container[4:8])
    if riff_len + 8 > len(container):
        raise ValueError("truncated RIFF")
    pos, end = 12, 8 + riff_len
    width = height = None
    frames: list[bytes] = []
    saw_mjpg = False

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, saw_mjpg
        import struct

        while pos + 8 <= end:
            tag = container[pos : pos + 4]
            (ln,) = struct.unpack("<I", container[pos + 4 : pos + 8])
            body_at = pos + 8
            if body_at + ln > end:
                raise ValueError(f"chunk {tag!r} overruns its parent")
            if tag == b"LIST":
                walk(body_at + 4, body_at + ln)
            elif tag == b"avih":
                hdr = struct.unpack("<14I", container[body_at : body_at + 56])
                width, height = hdr[8], hdr[9]
            elif tag == b"strh":
                if container[body_at : body_at + 4] == b"vids":
                    handler = container[body_at + 4 : body_at + 8]
                    if handler != b"MJPG":
                        raise NotImplementedError(
                            f"video stream {handler!r}: only MJPG is "
                            "supported; deploy ffmpeg for the long tail"
                        )
                    saw_mjpg = True
            elif tag in (b"00dc", b"00db"):
                frames.append(bytes(container[body_at : body_at + ln]))
            pos = body_at + ln + (ln % 2)

    walk(pos, end)
    if width is None:
        raise ValueError("missing avih header")
    if not saw_mjpg:
        raise NotImplementedError("no MJPG video stream found")
    return width, height, frames


MJPEG_FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, width int, height int, "
    "mean_pixel_ppm bigint, px_checksum bigint"
)


def mjpeg_video_frame_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Video frame extraction through a REAL container + REAL codec:
    each payload becomes an MJPEG AVI (one 64x64 flat-tile JPEG per
    64-byte slice, the last slice zero-padded), the AVI is decoded
    back (RIFF walk, per-frame baseline JPEG decode), and per-frame
    features come from the DECODED pixels — the 1→N fan-out shape of a
    real frame sampler, fully oracle-checkable."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                n_frames = max(1, -(-len(raw) // AVI_FRAME_BYTES))
                jpegs = [
                    jpeg_encode(
                        raw[i * AVI_FRAME_BYTES : (i + 1) * AVI_FRAME_BYTES]
                        .ljust(AVI_FRAME_BYTES, b"\x00"),
                        blocks_per_row=8,
                    )
                    for i in range(n_frames)
                ]
                avi = avi_encode_mjpeg(jpegs, 64, 64)
                w, h, back = avi_decode_mjpeg(avi)
                for idx, fr in enumerate(back):
                    fw, fh, px = jpeg_decode(fr)
                    assert (fw, fh) == (w, h)
                    rows.append(
                        (
                            doc_id,
                            idx,
                            fw,
                            fh,
                            sum(px) * 1_000_000 // (fw * fh),
                            _frame_checksum(px),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "frame_idx",
                    "width",
                    "height",
                    "mean_pixel_ppm",
                    "px_checksum",
                ],
            )

    src = df.select(id_col, payload_col)
    src = src.repartition(src.sparkSession.sparkContext.defaultParallelism)
    return src.mapInPandas(feats, schema=MJPEG_FRAME_SCHEMA)
