"""Pure-Python/numpy media codecs for the multimodal tier: PNG (zlib +
struct, RFC 2083), WAV (RIFF PCM), and AVI video with uncompressed BI_RGB
frames (RIFF, the same chunk walk as WAV). No PIL/ffmpeg — these formats
are just structured bytes, so the decode slot of the multimodal pipeline is
REAL for image, audio, AND video; codec-bound containers (mp4/h264 et al.)
raise an explicit ValueError at decode (transcode upstream), never a stub.

Scope: grayscale (color type 0) and RGB8 (color type 2) PNG, bit depth 8,
non-interlaced, all five scanline filters on decode (encode always writes
filter 0); 16-bit mono/stereo PCM WAV; 24-bit BI_RGB AVI ('00db' DIB
frames, bottom-up BGR rows, 4-byte row stride). Enough to round-trip
everything ``synth_media`` produces and anything a test plants.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """Grayscale [h,w] or RGB [h,w,3] uint8 → PNG bytes (filter 0 rows)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, channels = 0, 1
        h, w = img.shape
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
        h, w = img.shape[:2]
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = img.reshape(h, w * channels)
    scanlines = b"".join(b"\x00" + raw[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array [h,w] (grayscale) or [h,w,3] (RGB).

    Handles all five PNG scanline filters (None/Sub/Up/Average/Paeth),
    8-bit depth, non-interlaced."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, width = 8, None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in (0, 2) or interlace:
                raise ValueError(
                    f"unsupported PNG variant (depth={depth}, color={color_type},"
                    f" interlace={interlace})"
                )
            channels = 1 if color_type == 0 else 3
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        ).copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            out[y] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (int(line[x]) + int(left)) & 0xFF
        elif ftype == 2:  # Up
            out[y] = line + prev
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                out[y, x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                out[y, x] = (int(line[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return out.reshape(height, width) if channels == 1 else out.reshape(
        height, width, 3
    )


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample (pure index math — deterministic)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[ys][:, xs]


def wav_encode(samples: np.ndarray, rate: int = 8000, channels: int = 1) -> bytes:
    """int16 PCM samples → RIFF/WAVE bytes."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_list(four_cc: bytes, body: bytes) -> bytes:
    return b"LIST" + struct.pack("<I", len(body) + 4) + four_cc + body


def _avi_chunk(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def avi_encode(frames: np.ndarray, fps: int = 10) -> bytes:
    """[n,h,w,3] uint8 RGB frames → AVI bytes with uncompressed BI_RGB
    '00db' DIB frames (bottom-up BGR rows, stride padded to 4 bytes) —
    the one video container that, like WAV, is pure structured bytes."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(f"expected [n,h,w,3] RGB frames, got {frames.shape}")
    n, h, w, _ = frames.shape
    stride = (w * 3 + 3) & ~3
    frame_bytes = stride * h
    us_per_frame = 1_000_000 // fps

    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, frame_bytes * fps, 0, 0, n, 0, 1, frame_bytes, w, h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII4H", 0, 0, 0, 0, 1, fps, 0, n,
                                        frame_bytes, 0xFFFFFFFF, 0, 0, 0, w, h)
    )
    # BITMAPINFOHEADER: biCompression=0 is BI_RGB (uncompressed)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0)
    hdrl = _avi_list(
        b"hdrl",
        _avi_chunk(b"avih", avih)
        + _avi_list(b"strl", _avi_chunk(b"strh", strh) + _avi_chunk(b"strf", strf)),
    )
    movi_frames = []
    pad = np.zeros((h, stride - w * 3), dtype=np.uint8)
    for f in frames:
        bgr = f[::-1, :, ::-1]  # bottom-up rows, BGR channel order
        rows = np.concatenate([bgr.reshape(h, w * 3), pad], axis=1)
        movi_frames.append(_avi_chunk(b"00db", rows.tobytes()))
    movi = _avi_list(b"movi", b"".join(movi_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_decode(data: bytes) -> tuple[np.ndarray, int]:
    """AVI bytes → ([n,h,w,3] uint8 RGB frames, us_per_frame). Uncompressed
    BI_RGB 24-bit '00db'/'00dc' frames only; anything codec-bound (mp4,
    h264-in-avi) raises ValueError — an explicit boundary, not a stub."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    w = h = None
    us_per_frame = 0
    frames = []
    # stream bookkeeping (r04 advisor): strf's meaning depends on the
    # enclosing strl's strh fccType — a 'vids' strf is a BITMAPINFOHEADER,
    # an 'auds' strf is a WAVEFORMATEX. Validating every strf as a bitmap
    # header mis-rejected legitimate video+audio files. Only the FIRST
    # 'vids' stream's strf is validated, and frame chunks are matched to
    # that stream's index ('01db' when audio is stream 0).
    stream_idx = -1
    vids_idx = None

    def walk(buf: bytes) -> None:
        nonlocal w, h, us_per_frame, stream_idx, vids_idx
        pos = 0
        while pos + 8 <= len(buf):
            tag = buf[pos : pos + 4]
            (length,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body = buf[pos + 8 : pos + 8 + length]
            pos += 8 + length + (length & 1)
            if tag == b"LIST":
                walk(body[4:])  # skip the list's fourcc, recurse into chunks
            elif tag == b"avih":
                vals = struct.unpack("<10I", body[:40])
                us_per_frame, w, h = vals[0], vals[8], vals[9]
            elif tag == b"strh":
                stream_idx += 1
                if body[:4] == b"vids" and vids_idx is None:
                    vids_idx = stream_idx
            elif tag == b"strf" and vids_idx is not None and stream_idx == vids_idx:
                size, bw, bh, _planes, bits, compression = struct.unpack(
                    "<IiiHHI", body[:20]
                )
                if compression != 0 or bits != 24:
                    raise ValueError(
                        f"unsupported AVI codec (compression={compression}, "
                        f"bits={bits}); only uncompressed BI_RGB 24-bit is "
                        "decodable without ffmpeg — transcode upstream"
                    )
            elif (
                len(tag) == 4
                and tag[2:4] in (b"db", b"dc")
                and tag[:2].isdigit()
                and vids_idx is not None
                and int(tag[:2]) == vids_idx
            ):
                frames.append(body)

    walk(data[12:])
    if w is None or not frames:
        raise ValueError("AVI missing avih header or frames")
    stride = (w * 3 + 3) & ~3
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(frames):
        rows = np.frombuffer(raw[: stride * h], dtype=np.uint8).reshape(h, stride)
        out[i] = rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]  # re-flip to RGB
    return out, us_per_frame


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (int16 samples, sample_rate). 16-bit PCM only."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)
        if tag == b"fmt ":
            audio_fmt, _ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
        elif tag == b"data":
            samples = np.frombuffer(body, dtype="<i2")
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples, rate
