"""Pure-stdlib media codecs for the multimodal stages — SURVEY §2 L-5.

Real, dependency-free decoders for three classic uncompressed formats:

* **PPM (P6)** — 'P6\\n<w> <h>\\n255\\n' + raw RGB triples;
* **BMP** — 24-bit uncompressed BI_RGB, bottom-up rows, 4-byte padded;
* **WAV** — PCM16 via the stdlib ``wave`` module;
* **Y4M (YUV4MPEG2)** — the classic uncompressed VIDEO container
  (mjpegtools): one ASCII stream header, then per frame ``FRAME\\n`` +
  raw planar pixels.  C444 only (full-res Y/U/V planes — byte-exact
  arithmetic; subsampled C420 would need resampling, an external
  codec's job).

These make ``decode_stub=False`` a REAL end-to-end path in
``multimodal.extract_features`` / ``resize_images`` / ``sample_frames``
without any image/audio library: the formats are simple enough that the
decode is a header parse plus a numpy reshape.  Compressed formats
(JPEG/PNG/MP4) still belong to an external codec and raise
``UnsupportedMediaError`` at the clearly-marked point.

Encoders are provided for the same formats so tests (and the resize
stage's output) can round-trip real bytes.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

__all__ = [
    "UnsupportedMediaError",
    "sniff_format",
    "decode_image",
    "decode_ppm",
    "decode_bmp",
    "decode_wav",
    "decode_y4m",
    "encode_ppm",
    "encode_bmp",
    "encode_wav",
    "encode_y4m",
    "resize_nearest",
]


class UnsupportedMediaError(ValueError):
    """Payload is not one of the formats this stdlib codec set decodes."""


def sniff_format(raw: bytes) -> str | None:
    """'ppm' | 'bmp' | 'wav' | None, from magic bytes."""
    if raw[:2] == b"P6":
        return "ppm"
    if raw[:2] == b"BM":
        return "bmp"
    if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        return "wav"
    if raw[:9] == b"YUV4MPEG2":
        return "y4m"
    return None


# ---------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------

def decode_ppm(raw: bytes) -> np.ndarray:
    """P6 PPM → (h, w, 3) uint8 array."""
    if raw[:2] != b"P6":
        raise UnsupportedMediaError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(raw) and raw[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(raw[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise UnsupportedMediaError(f"PPM maxval {maxval} unsupported (need 255)")
    need = w * h * 3
    data = raw[pos : pos + need]
    if len(data) < need:
        raise UnsupportedMediaError("PPM pixel data truncated")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array → P6 PPM bytes."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


# ---------------------------------------------------------------------
# BMP (24-bit BI_RGB)
# ---------------------------------------------------------------------

def decode_bmp(raw: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB array."""
    if raw[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP payload")
    data_offset = struct.unpack_from("<I", raw, 10)[0]
    header_size = struct.unpack_from("<I", raw, 14)[0]
    if header_size < 40:
        raise UnsupportedMediaError(f"BMP header size {header_size} unsupported")
    w, h = struct.unpack_from("<ii", raw, 18)
    planes, bpp = struct.unpack_from("<HH", raw, 26)
    compression = struct.unpack_from("<I", raw, 30)[0]
    if bpp != 24 or compression != 0:
        raise UnsupportedMediaError(
            f"only 24-bit BI_RGB BMP supported (bpp={bpp}, compression={compression})"
        )
    flipped = h > 0  # positive height → rows stored bottom-up
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    need = stride * h
    data = raw[data_offset : data_offset + need]
    if len(data) < need:
        raise UnsupportedMediaError("BMP pixel data truncated")
    rows = np.frombuffer(data, dtype=np.uint8).reshape(h, stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return img[::-1] if flipped else img


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array → 24-bit BI_RGB BMP bytes."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    bgr = pixels.astype(np.uint8)[:, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    body = rows[::-1].tobytes()  # bottom-up
    data_offset = 14 + 40
    file_size = data_offset + len(body)
    return (
        struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + body
    )


# ---------------------------------------------------------------------
# WAV (PCM16)
# ---------------------------------------------------------------------

def decode_wav(raw: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → ((frames, channels) int16 array, sample_rate)."""
    try:
        with wave.open(io.BytesIO(raw), "rb") as f:
            if f.getsampwidth() != 2:
                raise UnsupportedMediaError(
                    f"only PCM16 WAV supported (sampwidth={f.getsampwidth()})"
                )
            n, ch, rate = f.getnframes(), f.getnchannels(), f.getframerate()
            samples = np.frombuffer(f.readframes(n), dtype="<i2").reshape(-1, ch)
            return samples, rate
    except wave.Error as exc:
        raise UnsupportedMediaError(f"bad WAV payload: {exc}") from exc


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(frames, channels) int16 array → PCM16 WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------
# Y4M (YUV4MPEG2, C444)
# ---------------------------------------------------------------------

def decode_y4m(raw: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """YUV4MPEG2 C444 → ((n_frames, h, w, 3) uint8 array, (fps_n, fps_d)).

    Channels are the RAW Y/U/V plane values interleaved per pixel — no
    colorspace conversion (that is a consumer decision; keeping bytes
    raw keeps every downstream hash engine-reproducible).  Only C444
    (full-resolution planes) decodes; subsampled modes raise
    `UnsupportedMediaError` at the clearly-marked point where a real
    resampler would plug in."""
    if raw[:9] != b"YUV4MPEG2":
        raise UnsupportedMediaError("not a YUV4MPEG2 payload")
    eol = raw.find(b"\n")
    if eol < 0:
        raise UnsupportedMediaError("Y4M stream header unterminated")
    w = h = 0
    fps = (30, 1)
    colorspace = "C420"  # the spec's default when no C tag is present
    for tok in raw[9:eol].split():
        t = tok.decode("ascii", "replace")
        if t[:1] == "W":
            w = int(t[1:])
        elif t[:1] == "H":
            h = int(t[1:])
        elif t[:1] == "F":
            num, den = t[1:].split(":")
            fps = (int(num), int(den))
        elif t[:1] == "C":
            colorspace = t
    if not w or not h:
        raise UnsupportedMediaError("Y4M header missing W/H")
    if colorspace != "C444":
        raise UnsupportedMediaError(
            f"only C444 Y4M supported (got {colorspace}): subsampled "
            "planes need a chroma resampler (pyav/ffmpeg)"
        )
    plane = w * h
    pos, frames = eol + 1, []
    while pos < len(raw):
        feol = raw.find(b"\n", pos)
        if feol < 0 or raw[pos : pos + 5] != b"FRAME":
            raise UnsupportedMediaError("Y4M frame header malformed")
        pos = feol + 1
        data = raw[pos : pos + plane * 3]
        if len(data) < plane * 3:
            raise UnsupportedMediaError("Y4M frame data truncated")
        planes = np.frombuffer(data, dtype=np.uint8).reshape(3, h, w)
        frames.append(np.stack([planes[0], planes[1], planes[2]], axis=-1))
        pos += plane * 3
    return np.stack(frames) if frames else np.zeros((0, h, w, 3), np.uint8), fps


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (30, 1)) -> bytes:
    """(n_frames, h, w, 3) uint8 array → YUV4MPEG2 C444 bytes
    (channels written as full-res Y/U/V planes, values verbatim)."""
    n, h, w, _ = frames.shape
    out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C444\n" % (w, h, fps[0], fps[1])]
    for i in range(n):
        f = frames[i].astype(np.uint8)
        out.append(b"FRAME\n")
        out.append(f[:, :, 0].tobytes())
        out.append(f[:, :, 1].tobytes())
        out.append(f[:, :, 2].tobytes())
    return b"".join(out)


# ---------------------------------------------------------------------
# Shared helpers
# ---------------------------------------------------------------------

def decode_image(raw: bytes) -> np.ndarray:
    """PPM or BMP → (h, w, 3) uint8 RGB; raises UnsupportedMediaError."""
    fmt = sniff_format(raw)
    if fmt == "ppm":
        return decode_ppm(raw)
    if fmt == "bmp":
        return decode_bmp(raw)
    raise UnsupportedMediaError(f"payload is not a decodable image (fmt={fmt})")


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an (h, w, 3) array to (height, width, 3)."""
    h, w, _ = pixels.shape
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[yi][:, xi]
