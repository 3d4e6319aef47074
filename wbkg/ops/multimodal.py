"""Multimodal (image/audio/video) column plumbing.

Media is carried as opaque `binary` payload columns + typed metadata structs;
transformations run as Arrow-batched pandas UDFs over mapInPandas.

Codec status: ALL THREE modalities have REAL decode paths — a pure-stdlib
PNG codec (zlib inflate + full scanline-filter reconstruction:
None/Sub/Up/Average/Paeth, decode_png), a RIFF/PCM16 WAV parser
(decode_wav), and an ISO BMFF video codec (encode_mp4_rgb /
decode_mp4_frames: moov/trak/stbl sample-table walk, frames sliced out of
mdat by stsz/stco) for uncompressed-RGB ('raw ') tracks. They feed real
pixels/samples/frames into extract_features, png_decode_stats,
wav_decode_stats and video_decode_stats. The remaining honest boundary:
COMPRESSED video codecs (avc1/hevc/...) need libav, which this container
lacks — decode_mp4_frames raises ValueError naming the codec, and
extract_features falls back to a deterministic payload-hash fake for such
payloads only.

At 100 TB: payloads dominate storage, so every operator here (a) prunes to
the metadata columns when the payload is not needed and (b) processes
payloads streaming per Arrow batch without collecting.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("doc_id", StringType()),
        StructField("kind", StringType()),      # image | audio | video
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_DIM = 16

PNG_SIG = b"\x89PNG\r\n\x1a\n"


# --------------------------------------------------------------------------- #
# Pure-stdlib PNG codec (zlib inflate/deflate + the five scanline filters).
# The encoder exists to make deterministic REAL png payloads for tests/bench;
# the decoder is the production decode path for image/png media.
# --------------------------------------------------------------------------- #

def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 -> PNG bytes. The scanline filter cycles through all five
    PNG filter types (y % 5), so decoding these payloads exercises the full
    reconstruction logic, not just filter 0."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png expects HxWx3 uint8")
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    bpp = 3
    raw = bytearray()
    prev = np.zeros((w, bpp), dtype=np.int32)
    for y in range(h):
        line = pixels[y].astype(np.int32)
        ftype = y % 5
        raw.append(ftype)
        if ftype == 0:  # None
            out = line
        elif ftype == 1:  # Sub
            left = np.vstack([np.zeros((1, bpp), np.int32), line[:-1]])
            out = (line - left) % 256
        elif ftype == 2:  # Up
            out = (line - prev) % 256
        elif ftype == 3:  # Average
            left = np.vstack([np.zeros((1, bpp), np.int32), line[:-1]])
            out = (line - (left + prev) // 2) % 256
        else:  # Paeth
            left = np.vstack([np.zeros((1, bpp), np.int32), line[:-1]])
            ul = np.vstack([np.zeros((1, bpp), np.int32), prev[:-1]])
            out = (line - _paeth(left, prev, ul)) % 256
        raw.extend(out.astype(np.uint8).tobytes())
        prev = line
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (a=left, b=up, c=upper-left)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> HxWxC uint8 (C=1 gray, 3 RGB, 4 RGBA; 8-bit,
    non-interlaced). Full scanline-filter reconstruction per the PNG spec
    §4.5.4 — the real decode path behind extract_features for image/png."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or interlace or comp or filt:
                raise ValueError(f"unsupported PNG (depth={depth}, interlace={interlace})")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
            if channels is None:
                raise ValueError(f"unsupported PNG color type {ctype}")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 1:  # Sub: sequential in pixel units, vector in channels
            line = line.reshape(w, bpp)
            for x in range(1, w):
                line[x] = (line[x] + line[x - 1]) % 256
            line = line.reshape(stride)
        elif ftype == 2:  # Up
            line = (line + prev) % 256
        elif ftype == 3:  # Average
            line = line.reshape(w, bpp)
            pr = prev.reshape(w, bpp)
            acc = np.zeros(bpp, dtype=np.int32)
            for x in range(w):
                acc = (line[x] + (acc + pr[x]) // 2) % 256
                line[x] = acc
            line = line.reshape(stride)
        elif ftype == 4:  # Paeth
            line = line.reshape(w, bpp)
            pr = prev.reshape(w, bpp)
            acc = np.zeros(bpp, dtype=np.int32)
            ul = np.zeros(bpp, dtype=np.int32)
            for x in range(w):
                acc = (line[x] + _paeth(acc, pr[x], ul)) % 256
                line[x] = acc
                ul = pr[x]
            line = line.reshape(stride)
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        img[y] = line.astype(np.uint8)
        prev = line.astype(np.int32)
    return img.reshape(h, w, channels)


def gen_png_pixels(d: int, m: int, width: int = 64, height: int = 48) -> np.ndarray:
    """Deterministic closed-form pixels — replayable in plain SQL:
    r=(x+y+base)%256, g=(2x+base)%256, b=(3y+base)%256, base=(2d+m)%251."""
    base = (2 * d + m) % 251
    x = np.arange(width)[None, :]
    y = np.arange(height)[:, None]
    r = (x + y + base) % 256
    g = (2 * x + np.zeros_like(y) + base) % 256
    b = (3 * y + np.zeros_like(x) + base) % 256
    return np.stack(
        [np.broadcast_to(r, (height, width)),
         np.broadcast_to(g, (height, width)),
         np.broadcast_to(b, (height, width))], axis=2
    ).astype(np.uint8)


# --------------------------------------------------------------------------- #
# Pure-stdlib WAV (RIFF PCM16) codec — the audio analogue of the PNG path.
# --------------------------------------------------------------------------- #

def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM16 bytes."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav expects 1-D int16 samples")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes):
    """RIFF/WAVE PCM16 mono -> (samples int16 ndarray, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={audio_fmt}, ch={channels}, bits={bits})"
                )
        elif tag == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + ln + (ln & 1)  # RIFF chunks pad to even length
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples, rate


def gen_wav_samples(d: int, m: int, n: int = 4000) -> np.ndarray:
    """Deterministic closed-form samples — replayable in plain SQL:
    s[i] = ((i * (3 + d) + 17 * d + m) % 4096) - 2048."""
    i = np.arange(n, dtype=np.int64)
    return (((i * (3 + d) + 17 * d + m) % 4096) - 2048).astype(np.int16)


# --------------------------------------------------------------------------- #
# MP4 container METADATA parsing (ISO BMFF box walk). The frame codec stays
# stubbed; the container structure — the part a 100 TB pipeline needs for
# routing/sampling decisions without decoding — parses for real.
# --------------------------------------------------------------------------- #

def encode_mp4_stub(timescale: int, duration: int, brand: bytes = b"isom") -> bytes:
    """Minimal valid ISO BMFF: ftyp + moov(mvhd v0). Payload carries no
    samples — it is a deterministic container for metadata-parse tests."""

    def box(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + tag + body

    ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    mvhd_body = (
        b"\x00\x00\x00\x00"            # version 0 + flags
        + struct.pack(">II", 0, 0)      # creation/modification time
        + struct.pack(">I", timescale)
        + struct.pack(">I", duration)
        + b"\x00" * 80                  # rate, volume, matrix, next track id
    )
    moov = box(b"moov", box(b"mvhd", mvhd_body))
    return ftyp + moov


def _mp4_box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def encode_mp4_rgb(
    frames: np.ndarray, timescale: int = 1000, duration: int | None = None
) -> bytes:
    """REAL ISO BMFF encoder for an uncompressed 24-bit RGB video track:
    ftyp + moov(mvhd + trak(tkhd + mdia(mdhd + hdlr + minf(vmhd + dinf +
    stbl(stsd['raw '] + stts + stsc + stsz + stco))))) + mdat holding the
    raw frames. 'raw ' is the classic QuickTime uncompressed-RGB sample
    format; stco carries absolute file offsets, one sample per chunk.
    frames: uint8 array (n_frames, height, width, 3)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = frames.shape
    if c != 3:
        raise ValueError("encode_mp4_rgb takes (n, h, w, 3) RGB frames")
    if duration is None:
        duration = n * 40  # 25 fps at the default ms timescale
    delta = duration // max(n, 1)
    frame_size = w * h * 3

    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")

    def build_moov(offsets: list[int]) -> bytes:
        mvhd = _mp4_box(
            b"mvhd",
            b"\x00\x00\x00\x00"
            + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, duration)
            + b"\x00" * 80,
        )
        tkhd = _mp4_box(
            b"tkhd",
            b"\x00\x00\x00\x07"          # version 0, flags: enabled+in-movie+preview
            + struct.pack(">II", 0, 0)    # creation/modification
            + struct.pack(">II", 1, 0)    # track id, reserved
            + struct.pack(">I", duration)
            + b"\x00" * 8                 # reserved
            + struct.pack(">hhhh", 0, 0, 0, 0)  # layer, alt group, volume, reserved
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed point
        )
        mdhd = _mp4_box(
            b"mdhd",
            b"\x00\x00\x00\x00"
            + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, duration)
            + struct.pack(">HH", 0x55C4, 0),  # language 'und'
        )
        hdlr = _mp4_box(
            b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12 + b"raw video\x00"
        )
        vmhd = _mp4_box(b"vmhd", b"\x00\x00\x00\x01" + b"\x00" * 8)
        dref = _mp4_box(
            b"dref",
            b"\x00\x00\x00\x00"
            + struct.pack(">I", 1)
            + _mp4_box(b"url ", b"\x00\x00\x00\x01"),  # self-contained
        )
        dinf = _mp4_box(b"dinf", dref)
        compressor = bytes([3]) + b"raw" + b"\x00" * 28  # pascal string, 32 bytes
        sample_entry = _mp4_box(
            b"raw ",
            b"\x00" * 6
            + struct.pack(">H", 1)        # data_reference_index
            + b"\x00" * 16                # pre_defined / reserved
            + struct.pack(">HH", w, h)
            + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
            + struct.pack(">I", 0)        # reserved
            + struct.pack(">H", 1)        # frame_count per sample
            + compressor
            + struct.pack(">Hh", 24, -1),  # depth, pre_defined
        )
        stsd = _mp4_box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + sample_entry)
        stts = _mp4_box(b"stts", b"\x00" * 4 + struct.pack(">III", 1, n, delta))
        stsc = _mp4_box(b"stsc", b"\x00" * 4 + struct.pack(">IIII", 1, 1, 1, 1))
        stsz = _mp4_box(
            b"stsz",
            b"\x00" * 4 + struct.pack(">II", frame_size, n),
        )
        stco = _mp4_box(
            b"stco",
            b"\x00" * 4 + struct.pack(">I", n) + struct.pack(f">{n}I", *offsets),
        )
        stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _mp4_box(b"minf", vmhd + dinf + stbl)
        mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
        trak = _mp4_box(b"trak", tkhd + mdia)
        return _mp4_box(b"moov", mvhd + trak)

    # stco holds absolute offsets into the file: build moov once with
    # placeholders to learn its (offset-independent) size, then for real
    moov_len = len(build_moov([0] * n))
    mdat_data_start = len(ftyp) + moov_len + 8
    offsets = [mdat_data_start + i * frame_size for i in range(n)]
    moov = build_moov(offsets)
    mdat = _mp4_box(b"mdat", frames.tobytes())
    return ftyp + moov + mdat


def _mp4_children(data: bytes, pos: int, end: int):
    """Yield (tag, body_start, body_end) for the boxes in [pos, end)."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        if size < 8 or pos + size > end:
            raise ValueError(f"bad box size {size} at {pos}")
        yield tag, pos + 8, pos + size
        pos += size


def _mp4_find(data: bytes, pos: int, end: int, tag: bytes):
    for t, s, e in _mp4_children(data, pos, end):
        if t == tag:
            return s, e
    raise ValueError(f"MP4 missing {tag.decode('latin1')} box")


def decode_mp4_frames(data: bytes) -> np.ndarray:
    """REAL MP4 frame decode for uncompressed-RGB ('raw ') tracks: walk
    moov/trak/mdia/minf/stbl, read the stsd sample entry for format and
    dimensions, stsz for sample sizes, stco for absolute chunk offsets
    (stsc validated as one-sample-per-chunk), slice the frames out of mdat
    and reshape to (n_frames, height, width, 3) uint8.

    Compressed codecs (avc1/hevc/vp09/...) need libav, which is not in
    this container — they raise ValueError naming the codec, the honest
    boundary that replaced the old blanket NotImplementedError stub."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF (MP4) payload")
    moov = _mp4_find(data, 0, len(data), b"moov")
    trak = _mp4_find(data, *moov, b"trak")
    mdia = _mp4_find(data, *trak, b"mdia")
    minf = _mp4_find(data, *mdia, b"minf")
    stbl = _mp4_find(data, *minf, b"stbl")

    stsd_s, stsd_e = _mp4_find(data, *stbl, b"stsd")
    (n_entries,) = struct.unpack(">I", data[stsd_s + 4:stsd_s + 8])
    if n_entries < 1:
        raise ValueError("empty stsd")
    entry_start = stsd_s + 8
    fmt = data[entry_start + 4:entry_start + 8]
    if fmt != b"raw ":
        raise ValueError(
            f"video codec {fmt.decode('latin1')!r} requires libav (not in this "
            "container); only uncompressed 'raw ' RGB tracks decode here"
        )
    # VisualSampleEntry: 8 header + 6 reserved + 2 dref index + 16 predefined
    w, h = struct.unpack(">HH", data[entry_start + 32:entry_start + 36])
    (depth,) = struct.unpack(">H", data[entry_start + 82:entry_start + 84])
    if depth != 24:
        raise ValueError(f"only 24-bit RGB supported, got depth {depth}")

    stsz_s, stsz_e = _mp4_find(data, *stbl, b"stsz")
    uniform, count = struct.unpack(">II", data[stsz_s + 4:stsz_s + 12])
    sizes = (
        [uniform] * count
        if uniform
        else list(struct.unpack(f">{count}I", data[stsz_s + 12:stsz_s + 12 + 4 * count]))
    )

    stsc_s, stsc_e = _mp4_find(data, *stbl, b"stsc")
    (n_stsc,) = struct.unpack(">I", data[stsc_s + 4:stsc_s + 8])
    if n_stsc != 1 or struct.unpack(">I", data[stsc_s + 12:stsc_s + 16])[0] != 1:
        raise ValueError("only one-sample-per-chunk layouts supported")

    stco_s, stco_e = _mp4_find(data, *stbl, b"stco")
    (n_chunks,) = struct.unpack(">I", data[stco_s + 4:stco_s + 8])
    if n_chunks != count:
        raise ValueError(f"stco/stsz mismatch: {n_chunks} chunks, {count} samples")
    offsets = struct.unpack(f">{n_chunks}I", data[stco_s + 8:stco_s + 8 + 4 * n_chunks])

    frames = np.empty((count, h, w, 3), dtype=np.uint8)
    expect = w * h * 3
    for i, (off, sz) in enumerate(zip(offsets, sizes)):
        if sz != expect:
            raise ValueError(f"sample {i}: size {sz} != {w}x{h}x3")
        if off + sz > len(data):
            raise ValueError(f"sample {i} offset {off} beyond payload")
        frames[i] = np.frombuffer(data[off:off + sz], dtype=np.uint8).reshape(h, w, 3)
    return frames


def gen_video_frames(
    d: int, m: int, n_frames: int = 4, width: int = 32, height: int = 24
) -> np.ndarray:
    """Closed-form frames (like gen_png_pixels): with base=(2d+m)%251,
    r=(x+2f+base)%256, g=(y+3f+base)%256, b=(x+y+f+base)%256 — so an
    independent oracle can replay per-frame channel means over a generated
    (f, x, y) grid without touching the codec."""
    base = (2 * d + m) % 251
    f = np.arange(n_frames)[:, None, None]
    y = np.arange(height)[None, :, None]
    x = np.arange(width)[None, None, :]
    zero = np.zeros((n_frames, height, width), dtype=np.int64)
    r = (x + 2 * f + base + zero) % 256
    g = (y + 3 * f + base + zero) % 256
    b = (x + y + f + base + zero) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def video_decode_stats(media: DataFrame) -> DataFrame:
    """video/mp4 -> one row PER DECODED FRAME: (media_id, n_frames, width,
    height, frame_idx, mean_r, mean_g, mean_b) from the payload's own
    samples via decode_mp4_frames. Column-pruned input, Arrow-batched,
    payloads never collected."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "n_frames": [], "width": [], "height": [],
                "frame_idx": [], "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = decode_mp4_frames(bytes(payload))
                n, h, w, _ = frames.shape
                means = frames.astype(np.float64).mean(axis=(1, 2))  # (n, 3)
                for i in range(n):
                    out["media_id"].append(mid)
                    out["n_frames"].append(n)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["frame_idx"].append(i)
                    out["mean_r"].append(round(means[i, 0], 4))
                    out["mean_g"].append(round(means[i, 1], 4))
                    out["mean_b"].append(round(means[i, 2], 4))
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("mime") == "video/mp4")
        .select("media_id", "payload")
        .mapInPandas(
            stats,
            schema="media_id string, n_frames int, width int, height int, "
                   "frame_idx int, mean_r double, mean_g double, mean_b double",
        )
    )


def parse_mp4_meta(data: bytes) -> dict:
    """ISO BMFF box walk -> {brand, timescale, duration, duration_ms,
    boxes}. Handles 32-bit box sizes and version-0/1 mvhd; loud on junk."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF (MP4) payload")
    meta = {"brand": data[8:12].decode("latin1"), "boxes": []}

    def walk(pos: int, end: int, depth: int = 0):
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", data[pos:pos + 4])
            tag = data[pos + 4:pos + 8]
            if size < 8 or pos + size > end:
                raise ValueError(f"bad box size {size} at {pos}")
            if depth == 0:
                meta["boxes"].append(tag.decode("latin1"))
            if tag == b"moov":
                walk(pos + 8, pos + size, depth + 1)
            elif tag == b"mvhd":
                ver = data[pos + 8]
                if ver == 1:
                    ts, dur = struct.unpack(">IQ", data[pos + 28:pos + 40])
                else:
                    ts, dur = struct.unpack(">II", data[pos + 20:pos + 28])
                meta["timescale"], meta["duration"] = ts, dur
            pos += size

    walk(0, len(data))
    if "timescale" not in meta:
        raise ValueError("MP4 missing moov/mvhd")
    meta["duration_ms"] = int(meta["duration"] * 1000 // max(meta["timescale"], 1))
    return meta


def mp4_meta_stats(media: DataFrame) -> DataFrame:
    """video/mp4 -> (media_id, brand, timescale, duration_payload_ms): real
    container metadata from the payload's own boxes (not the metadata
    columns); frame decode remains the documented stub."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "brand": [], "timescale": [],
                   "duration_payload_ms": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                m = parse_mp4_meta(bytes(payload))
                out["media_id"].append(mid)
                out["brand"].append(m["brand"])
                out["timescale"].append(m["timescale"])
                out["duration_payload_ms"].append(m["duration_ms"])
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("mime") == "video/mp4")
        .select("media_id", "payload")
        .mapInPandas(
            stats,
            schema="media_id string, brand string, timescale int, "
                   "duration_payload_ms int",
        )
    )


def gen_media_df(spark, docs: int = 20, per_doc: int = 2, seed: int = 42) -> DataFrame:
    """Deterministic media table. Image payloads are REAL PNGs (closed-form
    pixels via gen_png_pixels -> encode_png), audio payloads are REAL WAVs
    (gen_wav_samples -> encode_wav), and video payloads are REAL MP4s with
    an uncompressed-RGB track (gen_video_frames -> encode_mp4_rgb)."""
    rows = []
    for d in range(docs):
        for m in range(per_doc):
            kind = ["image", "audio", "video"][m % 3]
            if kind == "image":
                payload = encode_png(gen_png_pixels(d, m))
            elif kind == "audio":
                payload = encode_wav(gen_wav_samples(d, m))
            else:
                # real ISO BMFF with closed-form raw-RGB frames; mvhd
                # duration matches the metadata column's 1000*(m+1) ms
                payload = encode_mp4_rgb(
                    gen_video_frames(d, m), timescale=1000, duration=1000 * (m + 1)
                )
            rows.append(
                (
                    f"M{d:05d}_{m}",
                    f"D{d:07d}",
                    kind,
                    {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                    64 if kind != "audio" else None,
                    48 if kind != "audio" else None,
                    1000 * (m + 1) if kind != "image" else None,
                    payload,
                )
            )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Fallback for payloads in codecs this container cannot decode
    (compressed video, unknown containers): deterministic pseudo-samples
    derived from the payload hash. A real deployment swaps this for libav
    decode — signature and batch flow stay identical."""
    h = hashlib.blake2b(payload, digest_size=FEATURE_DIM * 4).digest()
    return np.frombuffer(h, dtype=np.uint32).astype(np.float64) / np.iinfo(np.uint32).max


def _feature_vector(payload: bytes) -> np.ndarray:
    """REAL paths for PNG (decode_png -> 16-bin luminance histogram over
    actual pixels), WAV (decode_wav -> 16-bin sample histogram) and
    uncompressed-RGB MP4 (decode_mp4_frames -> luminance histogram over
    all frames); deterministic hash fallback only for foreign codecs."""
    if payload[:8] == PNG_SIG:
        px = decode_png(payload).astype(np.float64)
        lum = px.mean(axis=2) if px.shape[2] > 1 else px[:, :, 0]
        hist, _ = np.histogram(lum, bins=FEATURE_DIM, range=(0.0, 256.0))
        return hist.astype(np.float64)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        samples, _rate = decode_wav(payload)
        hist, _ = np.histogram(
            samples.astype(np.float64), bins=FEATURE_DIM, range=(-2048.0, 2048.0)
        )
        return hist.astype(np.float64)
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        try:
            frames = decode_mp4_frames(payload)
        except ValueError:
            return _fake_decode(payload)  # compressed codec: needs libav
        lum = frames.astype(np.float64).mean(axis=3)
        hist, _ = np.histogram(lum, bins=FEATURE_DIM, range=(0.0, 256.0))
        return hist.astype(np.float64)
    return _fake_decode(payload)


def extract_features(media: DataFrame) -> DataFrame:
    """media -> (media_id, doc_id, kind, feature: array<float>).

    Column-pruned input (payload + keys only), Arrow-batched, one row out per
    row in. The feature vector is L2-normalized. image/png payloads are
    REALLY decoded (decode_png); other kinds use the documented stub.
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for payload in pdf["payload"]:
                v = _feature_vector(bytes(payload))
                norm = np.linalg.norm(v)
                vecs.append((v / norm if norm else v).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "feature": vecs,
                }
            )

    return media.select("media_id", "doc_id", "kind", "payload").mapInPandas(
        feats, schema="media_id string, doc_id string, kind string, feature array<float>"
    )


def png_decode_stats(media: DataFrame) -> DataFrame:
    """image/png -> (media_id, width, height, mean_r, mean_g, mean_b): the
    real decoded pixel statistics. Dims come from the PNG's own IHDR (not
    the metadata columns), so this is an end-to-end decode check — and with
    closed-form synthetic pixels (gen_png_pixels) the channel means are
    exactly replayable in SQL over a generated (x, y) grid."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "mean_r": [], "mean_g": [], "mean_b": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_png(bytes(payload))
                h, w, c = px.shape
                rgb = px if c >= 3 else np.repeat(px[:, :, :1], 3, axis=2)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                for i, k in enumerate(("mean_r", "mean_g", "mean_b")):
                    out[k].append(round(float(rgb[:, :, i].mean()), 4))
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("mime") == "image/png")
        .select("media_id", "payload")
        .mapInPandas(
            stats,
            schema="media_id string, width int, height int, "
                   "mean_r double, mean_g double, mean_b double",
        )
    )


def wav_decode_stats(media: DataFrame) -> DataFrame:
    """audio/wav -> (media_id, n_samples, sample_rate, duration_payload_ms,
    mean_abs, zero_crossings): real decoded sample statistics. The payload's
    own header supplies rate/length (not the metadata columns) and with
    closed-form synthetic samples (gen_wav_samples) every statistic is
    exactly replayable in SQL over a generated sample index."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "n_samples": [], "sample_rate": [],
                   "duration_payload_ms": [], "mean_abs": [], "zero_crossings": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                s, rate = decode_wav(bytes(payload))
                sf = s.astype(np.int64)
                out["media_id"].append(mid)
                out["n_samples"].append(len(s))
                out["sample_rate"].append(rate)
                out["duration_payload_ms"].append(int(len(s) * 1000 // rate))
                out["mean_abs"].append(round(float(np.abs(sf).mean()), 4))
                out["zero_crossings"].append(
                    int(((sf[:-1] < 0) != (sf[1:] < 0)).sum())
                )
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("mime") == "audio/wav")
        .select("media_id", "payload")
        .mapInPandas(
            stats,
            schema="media_id string, n_samples int, sample_rate int, "
                   "duration_payload_ms int, mean_abs double, zero_crossings int",
        )
    )


def frame_sample(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """video/audio -> one row per sampled frame offset (metadata-only op:
    exploding a sequence column; payload untouched and pruned)."""
    frames = F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
    return (
        media.filter(F.col("kind").isin("video", "audio"))
        .filter(F.col("duration_ms").isNotNull())
        .select("media_id", "doc_id", "kind", F.explode(frames).alias("frame_ms"))
    )


def resize_image(pixels: np.ndarray, max_side: int) -> np.ndarray:
    """REAL nearest-neighbor resize of a decoded (h, w, c) image so its
    longer side becomes max_side (aspect preserved, never upscales).
    Source index rule is the standard floor map x_src = floor(x_out * w /
    w_out) — deterministic, so an oracle can replay the resized pixel grid
    in closed form."""
    h, w = pixels.shape[:2]
    scale = min(max_side / max(w, 1), max_side / max(h, 1), 1.0)
    w_out = max(int(w * scale), 1)
    h_out = max(int(h * scale), 1)
    xs = (np.arange(w_out) * w) // w_out
    ys = (np.arange(h_out) * h) // h_out
    return pixels[np.ix_(ys, xs)]


def resize_png_stats(media: DataFrame, max_side: int = 32) -> DataFrame:
    """image/png -> the REAL resize pipeline: decode_png, nearest-neighbor
    downsample to max_side, then per-channel means of the RESIZED pixels —
    (media_id, out_w, out_h, mean_r, mean_g, mean_b). Column-pruned,
    Arrow-batched, payloads never collected. With the synthetic closed-form
    pixels the oracle replays the exact sampled grid."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "out_w": [], "out_h": [],
                   "mean_r": [], "mean_g": [], "mean_b": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = resize_image(decode_png(bytes(payload)), max_side)
                h, w = px.shape[:2]
                m = px.astype(np.float64).mean(axis=(0, 1))
                out["media_id"].append(mid)
                out["out_w"].append(w)
                out["out_h"].append(h)
                out["mean_r"].append(round(m[0], 4))
                out["mean_g"].append(round(m[1], 4))
                out["mean_b"].append(round(m[2], 4))
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("mime") == "image/png")
        .select("media_id", "payload")
        .mapInPandas(
            stats,
            schema="media_id string, out_w int, out_h int, "
                   "mean_r double, mean_g double, mean_b double",
        )
    )


def resample_audio(samples: np.ndarray, rate: int, factor: int) -> tuple:
    """REAL audio downsample by integer decimation: keep every `factor`-th
    sample -> (samples', rate/factor). Plain decimation (no anti-alias
    low-pass first — documented: a production resampler band-limits before
    decimating; the deterministic index rule is what the oracle replays)."""
    if factor < 1:
        raise ValueError(f"decimation factor must be >= 1, got {factor}")
    return samples[::factor], rate // factor


def wav_resample_stats(media: DataFrame, factor: int = 2) -> DataFrame:
    """audio/wav -> decode_wav, decimate by `factor`, stats of the
    RESAMPLED signal: (media_id, out_samples, out_rate, mean_abs).
    Arrow-batched mapInPandas, payloads never collected."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "out_samples": [], "out_rate": [], "mean_abs": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                s, rate = decode_wav(bytes(payload))
                s2, rate2 = resample_audio(s, rate, factor)
                out["media_id"].append(mid)
                out["out_samples"].append(len(s2))
                out["out_rate"].append(rate2)
                out["mean_abs"].append(round(float(np.abs(s2.astype(np.float64)).mean()), 4))
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("mime") == "audio/wav")
        .select("media_id", "payload")
        .mapInPandas(
            stats,
            schema="media_id string, out_samples int, out_rate int, mean_abs double",
        )
    )


def resize_meta(media: DataFrame, max_side: int = 32) -> DataFrame:
    """resize planning as pure column math (aspect-preserving target dims);
    the pixel resample itself would live in extract_features' decode step."""
    scale = F.least(
        F.lit(max_side) / F.greatest(F.col("width"), F.lit(1)),
        F.lit(max_side) / F.greatest(F.col("height"), F.lit(1)),
        F.lit(1.0),
    )
    return media.filter(F.col("width").isNotNull()).select(
        "media_id",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("target_w"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_h"),
    )
