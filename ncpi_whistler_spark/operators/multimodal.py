"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
struct of metadata next to them. Decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` — the only sanctioned Python-in-the-loop
path, because codecs don't exist as Column expressions. The Spark-side
plumbing (schemas, batching, partition sizing) is real and tested, and
so are the built-in codecs: dependency-free PPM/BMP image decode and
RIFF/WAVE PCM audio decode (no image/audio libs exist in this
environment, so the formats with pure-bytes containers are implemented
for real). Richer codecs (PNG/JPEG, mp3/ogg) plug in via ``decoder=``
callables without touching the Spark plumbing.

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


_BAD = {"width": 0, "height": 0, "channels": 0, "ok": False, "pix_sum": 0}


def _parse_ppm_header(payload: bytes) -> tuple[int, int, int, int] | None:
    """Parse a binary-PPM (P6) header: returns
    ``(width, height, maxval, pixel_offset)`` or None when malformed.
    Whitespace/comment-tolerant, fully bounds-guarded — the ONE header
    walker shared by decode_ppm and _to_pixel_array (round-4 ADVICE: two
    divergent walkers risked an unguarded executor loop if they ever
    drifted)."""
    try:
        if payload[:2] != b"P6":
            return None
        # header = magic + 3 ints, '#' comments allowed between tokens
        tokens: list[int] = []
        i = 2
        while len(tokens) < 3:
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":
                while i < len(payload) and payload[i] != 0x0A:
                    i += 1
                continue
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            if j == i:  # ran off the end without a token
                return None
            tokens.append(int(payload[i:j]))
            i = j
        i += 1  # single whitespace after maxval, then raw RGB
        w, h, maxval = tokens
        if w <= 0 or h <= 0 or not (0 < maxval < 65536):
            return None
        return w, h, maxval, i
    except (ValueError, IndexError):
        return None


def decode_ppm(payload: bytes) -> dict[str, Any]:
    """Real, dependency-free binary-PPM (P6) decode: parses the
    whitespace/comment-tolerant header (_parse_ppm_header), validates
    the pixel buffer length, and sums the raw RGB bytes. Returns
    ``{width, height, channels, ok, pix_sum}``; malformed input →
    ``ok=False`` zeros (never raises — a 100 TB decode pass must not die
    on one corrupt blob)."""
    hdr = _parse_ppm_header(payload)
    if hdr is None:
        return dict(_BAD)
    w, h, maxval, i = hdr
    bpp = 3 * (2 if maxval > 255 else 1)
    pixels = payload[i : i + w * h * bpp]
    if len(pixels) != w * h * bpp:
        return dict(_BAD)
    return {
        "width": w,
        "height": h,
        "channels": 3,
        "ok": True,
        "pix_sum": sum(pixels),
    }


def decode_bmp(payload: bytes) -> dict[str, Any]:
    """Real, dependency-free BMP decode (uncompressed 24/32-bit,
    BITMAPINFOHEADER): parses the file + info headers, walks the
    4-byte-aligned bottom-up rows, and sums pixel bytes excluding row
    padding. Malformed/compressed input → ``ok=False`` zeros."""
    import struct

    try:
        if payload[:2] != b"BM" or len(payload) < 54:
            return dict(_BAD)
        pix_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size = struct.unpack_from("<I", payload, 14)[0]
        if hdr_size < 40:
            return dict(_BAD)
        w, h = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        if planes != 1 or bpp not in (24, 32) or compression != 0:
            return dict(_BAD)
        height = abs(h)
        if w <= 0 or height == 0:
            return dict(_BAD)
        nbytes = bpp // 8
        stride = ((w * nbytes + 3) // 4) * 4
        if pix_off + stride * height > len(payload):
            return dict(_BAD)
        pix_sum = 0
        for r in range(height):
            row = payload[pix_off + r * stride : pix_off + r * stride + w * nbytes]
            pix_sum += sum(row)
        return {
            "width": w,
            "height": height,
            "channels": nbytes,
            "ok": True,
            "pix_sum": pix_sum,
        }
    except (struct.error, IndexError):
        return dict(_BAD)


def image_decoder(payload: bytes) -> dict[str, Any]:
    """Magic-byte dispatch over the built-in real codecs (PPM ``P6``,
    BMP ``BM``). Unknown formats → ``ok=False`` zeros; richer codecs
    (PNG/JPEG via PIL/opencv) plug in through ``decode_images
    (decoder=...)`` without touching the Spark plumbing."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    return dict(_BAD)


def decode_images(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    decoder: Callable[[bytes], dict[str, Any]] | None = None,
    batch_rows: int = 256,
) -> DataFrame:
    """Arrow-batched decode pass: mapInPandas with a bounded batch size so
    decoded frames never blow the executor heap.

    Output: (id, width, height, channels, ok, pix_sum) — real header
    parse + pixel-buffer walk via :func:`image_decoder` (PPM/BMP). A
    decoder returning pixel tensors would add a ``binary``/
    ``array<float>`` feature column — same plumbing.
    """
    decoder = decoder or image_decoder
    out_schema = (
        f"{id_col} bigint, width int, height int, channels int, ok boolean,"
        " pix_sum bigint"
    )

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
                            "pix_sum": meta.get("pix_sum", 0),
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


def _to_pixel_array(payload: bytes):
    """Decode a PPM/BMP payload to an (h, w, 3) uint8 RGB numpy array, or
    None if undecodable. 8-bit formats only (the resize path's contract);
    BMP rows are bottom-up BGR(A) and get flipped/reordered to RGB."""
    import numpy as np

    meta = image_decoder(payload)
    if not meta["ok"]:
        return None
    w, h = meta["width"], meta["height"]
    if payload[:2] == b"P6":
        # shared header parse for the pixel offset; reject 16-bit
        # maxval: decode_ppm accepts it for metadata, but THIS path's
        # contract is 8-bit — reading 2-byte samples as uint8 would hand
        # the resizer garbage pixels
        hdr = _parse_ppm_header(payload)
        if hdr is None or hdr[2] > 255:
            return None
        i = hdr[3]
        arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
        return arr.reshape(h, w, 3)
    import struct

    pix_off = struct.unpack_from("<I", payload, 10)[0]
    raw_h = struct.unpack_from("<ii", payload, 18)[1]
    nbytes = meta["channels"]
    stride = ((w * nbytes + 3) // 4) * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=pix_off
    ).reshape(h, stride)
    bgr = rows[:, : w * nbytes].reshape(h, w, nbytes)
    # negative biHeight = rows already stored top-down; only bottom-up
    # files (positive height) need the vertical flip
    if raw_h > 0:
        bgr = bgr[::-1]
    rgb = bgr[:, :, [2, 1, 0]]  # BGR(A) → RGB
    return np.ascontiguousarray(rgb)


def encode_ppm(arr) -> bytes:
    """(h, w, 3) uint8 array → binary-PPM (P6) payload."""
    h, w = arr.shape[0], arr.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def resize_images(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    target: tuple[int, int] = (224, 224),
    batch_rows: int = 64,
) -> DataFrame:
    """Real nearest-neighbor resize over decoded PPM/BMP payloads,
    re-encoded as P6 PPM. Arrow-batched mapInPandas with a small batch
    bound (decoded frames are the memory hot spot — at 100 TB,
    repartition by byte size first, see module docstring).

    Output: (id, width, height, payload) — undecodable inputs are
    dropped (they carry no pixels to resize; the decode pass reports
    them via ok=False)."""
    import numpy as np

    tw, th = target
    out_schema = f"{id_col} bigint, width int, height int, payload binary"

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                recs = []
                for mid, payload in zip(chunk[id_col], chunk[binary_col]):
                    arr = _to_pixel_array(
                        bytes(payload) if payload is not None else b""
                    )
                    if arr is None:
                        continue
                    h, w = arr.shape[0], arr.shape[1]
                    # nearest-neighbor index maps (pixel-center sampling)
                    yi = np.minimum(((np.arange(th) + 0.5) * h / th).astype(int), h - 1)
                    xi = np.minimum(((np.arange(tw) + 0.5) * w / tw).astype(int), w - 1)
                    out = arr[yi][:, xi]
                    recs.append(
                        {
                            id_col: mid,
                            "width": tw,
                            "height": th,
                            "payload": encode_ppm(out),
                        }
                    )
                yield pd.DataFrame.from_records(
                    recs,
                    columns=[id_col, "width", "height", "payload"],
                )

    return df.select(id_col, binary_col).mapInPandas(_resize, schema=out_schema)


# -------------------------------------------------------------------------
# Audio: real dependency-free RIFF/WAVE PCM codec (same philosophy as the
# PPM/BMP pair — the container parse and sample walk are REAL; lossy
# codecs (mp3/ogg) would plug in via decode_audio(decoder=...) without
# touching the Spark plumbing).
# -------------------------------------------------------------------------

_BAD_AUDIO = {
    "ok": False,
    "channels": 0,
    "sample_rate": 0,
    "bits": 0,
    "n_frames": 0,
    "duration_ms": 0,
    "rms": 0.0,
    "peak": 0.0,
}


def decode_wav(payload: bytes) -> dict[str, Any]:
    """Real RIFF/WAVE PCM decode: walks the chunk list (tolerating extra
    chunks like LIST/fact before ``data``), validates the fmt block
    (PCM, 8/16/32-bit), and computes frame count, duration, RMS, and
    peak over the normalized samples ([-1, 1]; 8-bit is unsigned with a
    128 offset per the spec). Truncated or malformed containers →
    ``ok=False`` zeros, never an exception — the corrupt-payload policy
    every media decoder in this module shares."""
    import numpy as np

    try:
        if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return dict(_BAD_AUDIO)
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            body = payload[pos + 8 : pos + 8 + size]
            if len(body) < size:
                return dict(_BAD_AUDIO)  # truncated chunk
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is None or data is None or len(fmt) < 16:
            return dict(_BAD_AUDIO)
        audio_format = int.from_bytes(fmt[0:2], "little")
        channels = int.from_bytes(fmt[2:4], "little")
        sample_rate = int.from_bytes(fmt[4:8], "little")
        bits = int.from_bytes(fmt[14:16], "little")
        if audio_format != 1 or channels < 1 or sample_rate < 1:
            return dict(_BAD_AUDIO)  # only uncompressed PCM here
        if bits == 8:
            samples = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            samples = (samples - 128.0) / 128.0
        elif bits == 16:
            samples = np.frombuffer(
                data[: len(data) - (len(data) % 2)], dtype="<i2"
            ).astype(np.float64) / 32768.0
        elif bits == 32:
            samples = np.frombuffer(
                data[: len(data) - (len(data) % 4)], dtype="<i4"
            ).astype(np.float64) / 2147483648.0
        else:
            return dict(_BAD_AUDIO)
        n_frames = len(samples) // channels
        if n_frames == 0:
            return dict(_BAD_AUDIO)
        samples = samples[: n_frames * channels]
        return {
            "ok": True,
            "channels": channels,
            "sample_rate": sample_rate,
            "bits": bits,
            "n_frames": n_frames,
            "duration_ms": int(n_frames * 1000 / sample_rate),
            "rms": float(np.sqrt(np.mean(samples * samples))),
            "peak": float(np.max(np.abs(samples))),
        }
    except Exception:
        return dict(_BAD_AUDIO)


def encode_wav(samples, sample_rate: int = 8000, bits: int = 16) -> bytes:
    """Mono PCM samples in [-1, 1] → RIFF/WAVE payload (test-fixture
    twin of decode_wav, like encode_ppm for the image pair)."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.float64)
    if bits == 8:
        data = (np.clip(arr, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        data = (np.clip(arr, -1, 1) * 32767).astype("<i2").tobytes()
    else:
        raise ValueError("encode_wav supports 8/16-bit PCM")
    block = bits // 8
    fmt = (
        (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def audio_decoder(payload: bytes) -> dict[str, Any]:
    """Magic-byte dispatch (RIFF/WAVE). Unknown formats → ok=False."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    return dict(_BAD_AUDIO)


def decode_audio(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    decoder: Callable[[bytes], dict[str, Any]] | None = None,
    batch_rows: int = 256,
) -> DataFrame:
    """Arrow-batched audio feature pass — the decode_images twin:
    (id, ok, channels, sample_rate, bits, n_frames, duration_ms, rms,
    peak) per payload, bounded batches so decoded sample buffers never
    blow the executor heap."""
    decoder = decoder or audio_decoder
    out_schema = (
        f"{id_col} bigint, ok boolean, channels int, sample_rate int,"
        " bits int, n_frames bigint, duration_ms bigint, rms double,"
        " peak double"
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                recs = []
                for mid, payload in zip(chunk[id_col], chunk[binary_col]):
                    meta = decoder(bytes(payload) if payload is not None else b"")
                    recs.append({id_col: mid, **meta})
                yield pd.DataFrame.from_records(
                    recs,
                    columns=[
                        id_col,
                        "ok",
                        "channels",
                        "sample_rate",
                        "bits",
                        "n_frames",
                        "duration_ms",
                        "rms",
                        "peak",
                    ],
                )

    return df.select(id_col, binary_col).mapInPandas(_decode, schema=out_schema)

# -------------------------------------------------------------------------
# Video: real dependency-free RIFF/AVI (uncompressed DIB) codec — the
# same chunk-walk machinery as the WAV codec, one level deeper (nested
# LIST chunks). Completes the codec set: images (PPM/BMP), audio (WAV),
# video (AVI). Compressed codecs (h264 etc.) would plug in via
# decode_video(decoder=...) without touching the Spark plumbing.
# -------------------------------------------------------------------------

_BAD_VIDEO = {
    "ok": False,
    "width": 0,
    "height": 0,
    "bits": 0,
    "n_frames": 0,
    "fps": 0.0,
    "duration_ms": 0,
}


def _walk_riff(payload: bytes, pos: int, end: int):
    """Yield (chunk_id, body_start, body_end) over a RIFF chunk run;
    raises ValueError on a truncated chunk (strict, like decode_wav —
    torn containers are rejected whole, never half-parsed)."""
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body_start = pos + 8
        body_end = body_start + size
        if body_end > end:
            raise ValueError("truncated RIFF chunk")
        yield cid, body_start, body_end
        pos = body_end + (size & 1)  # chunks are word-aligned
    if pos < end:
        raise ValueError("trailing garbage after last RIFF chunk")


def _parse_avi(payload: bytes):
    """Parse an AVI container: returns (meta dict, list of (start, end)
    frame-chunk spans) or raises ValueError. Uncompressed BI_RGB DIB
    video stream only (24/32-bit)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    declared = int.from_bytes(payload[4:8], "little")
    if 8 + declared != len(payload):
        # a truncation landing exactly on a chunk boundary would
        # otherwise parse as a shorter-but-valid container; the declared
        # RIFF size catches it (torn containers are rejected WHOLE)
        raise ValueError("RIFF size does not match payload length")
    avih = strf = None
    fps = 0.0
    frames: list[tuple[int, int]] = []
    for cid, s, e in _walk_riff(payload, 12, len(payload)):
        if cid != b"LIST" or e - s < 4:
            continue
        ltype = payload[s : s + 4]
        if ltype == b"hdrl":
            for c2, s2, e2 in _walk_riff(payload, s + 4, e):
                if c2 == b"avih" and e2 - s2 >= 40:
                    avih = struct.unpack_from("<10I", payload, s2)
                elif c2 == b"LIST" and payload[s2 : s2 + 4] == b"strl":
                    # strh/strf pairing is scoped PER strl: only a strl
                    # whose strh declares fccType 'vids' contributes its
                    # strf (BITMAPINFOHEADER) and fps — in a multi-stream
                    # AVI an audio strl's WAVEFORMATEXTENSIBLE strf must
                    # never overwrite the video header, and fps must come
                    # from the SAME strl as the accepted strf. First vids
                    # strl wins (the primary video stream).
                    strl_is_vids = False
                    strl_fps = 0.0
                    strl_strf = None
                    for c3, s3, e3 in _walk_riff(payload, s2 + 4, e2):
                        if c3 == b"strh" and e3 - s3 >= 56:
                            strl_is_vids = payload[s3 : s3 + 4] == b"vids"
                            if strl_is_vids:
                                scale, rate = struct.unpack_from(
                                    "<II", payload, s3 + 20
                                )
                                if scale:
                                    strl_fps = rate / scale
                        elif c3 == b"strf" and e3 - s3 >= 40 and strl_is_vids:
                            strl_strf = struct.unpack_from(
                                "<IiiHHII", payload, s3
                            )
                    if strl_strf is not None and strf is None:
                        strf, fps = strl_strf, strl_fps
        elif ltype == b"movi":
            for c2, s2, e2 in _walk_riff(payload, s + 4, e):
                # ##db / ##dc = video frame data for stream ##
                if c2[2:4] in (b"db", b"dc"):
                    frames.append((s2, e2))
    if avih is None or strf is None:
        raise ValueError("missing avih/strf header")
    width, height = avih[8], avih[9]
    bits, compression = strf[4], strf[5]
    if compression != 0 or bits not in (24, 32):
        raise ValueError("only uncompressed BI_RGB 24/32-bit AVI")
    if width < 1 or height < 1 or strf[1] != width or abs(strf[2]) != height:
        raise ValueError("avih/strf dimension mismatch")
    usec = avih[0]
    if not fps:
        fps = 1_000_000 / usec if usec else 0.0
    meta = {
        "ok": True,
        "width": int(width),
        "height": int(height),
        "bits": int(bits),
        "n_frames": len(frames),
        "fps": float(fps),
        "duration_ms": int(len(frames) * 1000 / fps) if fps else 0,
    }
    return meta, frames, int(strf[2])


def decode_avi(payload: bytes) -> dict[str, Any]:
    """AVI container metadata: (ok, width, height, bits, n_frames, fps,
    duration_ms). Truncated/malformed containers → ok=False zeros,
    never an exception (the shared corrupt-payload policy)."""
    try:
        meta, _, _ = _parse_avi(payload)
        return meta
    except Exception:
        return dict(_BAD_VIDEO)


def avi_frame_array(payload: bytes, frame_idx: int):
    """Decode ONE frame of an uncompressed AVI to an (h, w, 3) uint8 RGB
    array (None if the container or index is invalid). DIB rows are
    stride-padded bottom-up BGR like BMP; negative strf height means
    top-down."""
    import numpy as np

    try:
        meta, frames, raw_h = _parse_avi(payload)
        if not 0 <= frame_idx < len(frames):
            return None
        w, h, bits = meta["width"], meta["height"], meta["bits"]
        nbytes = bits // 8
        stride = ((w * nbytes + 3) // 4) * 4
        s, e = frames[frame_idx]
        if e - s < stride * h:
            return None
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=s
        ).reshape(h, stride)
        bgr = rows[:, : w * nbytes].reshape(h, w, nbytes)
        if raw_h > 0:
            bgr = bgr[::-1]  # bottom-up → top-down
        return np.ascontiguousarray(bgr[:, :, [2, 1, 0]][:, :, :3])
    except Exception:
        return None


def encode_avi(frames, fps: int = 10) -> bytes:
    """List of (h, w, 3) uint8 RGB arrays → uncompressed RIFF/AVI
    payload (test-fixture twin of decode_avi, like encode_ppm/encode_wav
    for their pairs). 24-bit BI_RGB, bottom-up rows."""
    import struct

    import numpy as np

    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w = frames[0].shape[0], frames[0].shape[1]
    stride = ((w * 3 + 3) // 4) * 4

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + len(body).to_bytes(4, "little") + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    def dib(frame) -> bytes:
        arr = np.asarray(frame, dtype=np.uint8)
        if arr.shape[:2] != (h, w):
            raise ValueError("all frames must share one size")
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = arr[:, :, [2, 1, 0]].reshape(h, w * 3)  # RGB→BGR
        return rows[::-1].tobytes()  # bottom-up

    usec = int(1_000_000 / fps)
    avih = struct.pack(
        "<10I", usec, 0, 0, 0, len(frames), 0, 1, stride * h, w, h
    ) + b"\x00" * 16
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), stride * h, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00db", dib(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def video_decoder(payload: bytes) -> dict[str, Any]:
    """Magic-byte dispatch (RIFF/AVI). Unknown formats → ok=False."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return decode_avi(payload)
    return dict(_BAD_VIDEO)


def decode_video(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    decoder: Callable[[bytes], dict[str, Any]] | None = None,
    batch_rows: int = 64,
) -> DataFrame:
    """Arrow-batched video metadata pass — the decode_images/decode_audio
    twin: (id, ok, width, height, bits, n_frames, fps, duration_ms) per
    payload, small batch bound (video payloads are the largest binaries
    in the table — at 100 TB repartition by byte size first, see module
    docstring)."""
    decoder = decoder or video_decoder
    out_schema = (
        f"{id_col} bigint, ok boolean, width int, height int, bits int,"
        " n_frames int, fps double, duration_ms bigint"
    )
    cols = ["ok", "width", "height", "bits", "n_frames", "fps", "duration_ms"]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk_ = pdf.iloc[start : start + batch_rows]
                recs = []
                for mid, payload in zip(chunk_[id_col], chunk_[binary_col]):
                    meta = decoder(bytes(payload) if payload is not None else b"")
                    recs.append({id_col: mid, **meta})
                yield pd.DataFrame.from_records(recs, columns=[id_col] + cols)

    return df.select(id_col, binary_col).mapInPandas(_decode, schema=out_schema)


def extract_frames(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    every_n: int = 30,
    with_stats: bool = False,
    batch_rows: int = 16,
) -> DataFrame:
    """REAL frame sampling (the decode half frame_sample_plan only
    plans): every ``every_n``-th frame of each AVI payload decoded and
    re-encoded as a P6 PPM payload — the output feeds the existing image
    ops (decode_images, resize_images) unchanged. ``with_stats`` adds a
    ``pix_sum`` column (uint8 sum over the RGB frame) for cheap
    oracle-checkable verification. Undecodable payloads produce no rows
    (they carry no frames; decode_video reports them via ok=False).

    Scale shape: one Python pass per payload, frames fan out WITHIN the
    Arrow batch — no driver loop, no per-frame task; batch_rows is small
    because decoded frame sets are the memory hot spot."""
    stats_part = ", pix_sum bigint" if with_stats else ""
    out_schema = (
        f"{id_col} bigint, frame_idx int, width int, height int,"
        f" payload binary{stats_part}"
    )
    cols = [id_col, "frame_idx", "width", "height", "payload"] + (
        ["pix_sum"] if with_stats else []
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk_ = pdf.iloc[start : start + batch_rows]
                recs = []
                for mid, payload in zip(chunk_[id_col], chunk_[binary_col]):
                    raw = bytes(payload) if payload is not None else b""
                    meta = video_decoder(raw)
                    if not meta["ok"]:
                        continue
                    for idx in range(0, meta["n_frames"], every_n):
                        arr = avi_frame_array(raw, idx)
                        if arr is None:
                            continue
                        rec = {
                            id_col: mid,
                            "frame_idx": idx,
                            "width": arr.shape[1],
                            "height": arr.shape[0],
                            "payload": encode_ppm(arr),
                        }
                        if with_stats:
                            rec["pix_sum"] = int(arr.astype("int64").sum())
                        recs.append(rec)
                yield pd.DataFrame.from_records(recs, columns=cols)

    return df.select(id_col, binary_col).mapInPandas(_extract, schema=out_schema)
