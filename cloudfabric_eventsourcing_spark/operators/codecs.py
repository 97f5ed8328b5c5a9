"""Dependency-free media codecs: PNG and WAV, in pure Python + numpy.

The multimodal operators (operators/multimodal.py) need a real byte ->
pixels/samples step to be more than plumbing.  Full-blown image/audio
stacks (PIL, torchaudio, av) are not in this container, but the two
formats that dominate checked-in fixtures and lossless pipelines are
decodable from the spec with stdlib only:

  * PNG: zlib-compressed filtered scanlines (ISO/IEC 15948).  Supported
    here: 8-bit grayscale / gray+alpha / RGB / RGBA / palette,
    non-interlaced, all five scanline filters (None/Sub/Up/Average/
    Paeth).  That covers everything a standard encoder with default
    settings emits.  16-bit and Adam7 interlace raise cleanly.
  * WAV: RIFF PCM via the stdlib `wave` module.

Production swap-in: `multimodal._decode_image` prefers PIL when it IS
importable, so deployments with real image stacks get JPEG/WebP/etc for
free; this module is the hermetic floor, not a ceiling.

Performance note: the pure-Python unfilter loop is sequential per byte
(the filters are defined recursively along the scanline), ~MB/s per
core.  It runs executor-side inside mapInPandas, so throughput scales
with cores; at real 100 TB scale you would install PIL/turbojpeg on the
executors and this fallback never runs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == _PNG_SIG


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """PNG bytes -> (width, height, channels, raw row-major pixels).
    Palette images are expanded to RGB; gray+alpha / RGBA keep their
    alpha channel.  8-bit, non-interlaced only (see module docstring)."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat = bytearray()
    palette = b""
    w = h = color = None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        pos += 8
        chunk = data[pos:pos + length]
        pos += length + 4  # payload + CRC (we trust transport integrity)
        if ctype == b"IHDR":
            w, h, bit, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if bit != 8:
                raise NotImplementedError(f"PNG bit depth {bit} (only 8)")
            if interlace:
                raise NotImplementedError("Adam7-interlaced PNG")
            if color not in _CHANNELS:
                raise ValueError(f"PNG color type {color}")
        elif ctype == b"PLTE":
            palette = chunk
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    channels = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    rpos = 0
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(h):
        f = raw[rpos]
        line = bytearray(raw[rpos + 1:rpos + 1 + stride])
        rpos += 1 + stride
        if f == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"PNG scanline filter {f}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    if color == 3:  # palette -> RGB
        if not palette:
            raise ValueError("palette PNG missing PLTE")
        idx = np.frombuffer(bytes(out), np.uint8)
        pal = np.frombuffer(palette, np.uint8).reshape(-1, 3)
        return w, h, 3, pal[idx].tobytes()
    return w, h, channels, bytes(out)


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """(w, h, channels, raw pixels) -> minimal valid PNG (filter None,
    single IDAT).  channels: 1=gray, 2=gray+alpha, 3=RGB, 4=RGBA."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer size mismatch")
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter: None
        raw += pixels[y * stride:(y + 1) * stride]

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def nearest_resize(
    width: int, height: int, channels: int, pixels: bytes,
    new_width: int, new_height: int,
) -> bytes:
    """Nearest-neighbor resample on the raw pixel buffer (numpy fancy
    indexing — vectorized, no Python pixel loop)."""
    arr = np.frombuffer(pixels, np.uint8).reshape(height, width, channels)
    ys = (np.arange(new_height) * height) // new_height
    xs = (np.arange(new_width) * width) // new_width
    return np.ascontiguousarray(arr[ys][:, xs]).tobytes()


def image_features(
    width: int, height: int, channels: int, pixels: bytes, out_dim: int = 16
) -> list[float]:
    """Fixed-size content descriptor from raw pixels: an out_dim-bin
    luminance histogram normalized to sum 1 (Rec. 601 weights for RGB).
    Deterministic, engine-independent, and meaningful for near-dup /
    clustering downstream (unlike the byte-hash stand-in)."""
    arr = np.frombuffer(pixels, np.uint8).reshape(-1, channels).astype(np.float64)
    if channels >= 3:
        lum = arr[:, 0] * 0.299 + arr[:, 1] * 0.587 + arr[:, 2] * 0.114
    else:
        lum = arr[:, 0]
    hist, _ = np.histogram(lum, bins=out_dim, range=(0.0, 256.0))
    n = max(lum.size, 1)
    return (hist / n).tolist()


def decode_wav(data: bytes) -> tuple[int, int, int, bytes]:
    """WAV bytes -> (sample_rate, n_channels, sample_width_bytes, frames).
    PCM RIFF via the stdlib wave module."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as wf:
        return (
            wf.getframerate(),
            wf.getnchannels(),
            wf.getsampwidth(),
            wf.readframes(wf.getnframes()),
        )


def encode_wav(
    sample_rate: int, n_channels: int, sample_width: int, frames: bytes
) -> bytes:
    """Inverse of decode_wav — used to build fixtures and chunk output."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_channels)
        wf.setsampwidth(sample_width)
        wf.setframerate(sample_rate)
        wf.writeframes(frames)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# AVI (uncompressed RGB) — the video floor
#
# Compressed video genuinely needs av/ffmpeg, but the RIFF/AVI container
# with uncompressed BI_RGB frames is parseable from the spec with struct
# alone — the same status WAV has on the audio side.  Frames are stored
# as bottom-up 24-bit BGR DIBs with 4-byte-padded rows ('00db' chunks in
# the 'movi' list); decode flips to top-down RGB so the output composes
# directly with encode_png / image_features.  Anything compressed
# ('00dc' with a non-zero biCompression) raises cleanly — that honesty
# boundary is documented at the multimodal operator.
# ---------------------------------------------------------------------------

def is_avi(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _riff_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking a RIFF body;
    chunks are word-aligned (odd sizes padded with one byte)."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi(data: bytes) -> tuple[int, int, float, list[bytes]]:
    """AVI bytes -> (width, height, fps, [top-down RGB frame bytes]).

    Supports the uncompressed-RGB profile: BITMAPINFOHEADER with
    biCompression == 0 (BI_RGB), 24 bits per pixel, frames in '00db'
    (or '00dc' with BI_RGB) chunks.  Raises ValueError on anything
    else — compressed codecs need a real decoder stack."""
    if not is_avi(data):
        raise ValueError("not an AVI file")
    width = height = None
    bit_count = compression = None
    top_down = False
    usec_per_frame = None
    # stream bookkeeping: strh chunks appear in stream-declaration order,
    # and each stream's data chunks are tagged '<NN>db'/'<NN>dc' with NN =
    # that zero-based order.  Taking the FIRST strf regardless of its
    # owning strh's fccType would parse a WAVEFORMATEX as a
    # BITMAPINFOHEADER whenever the audio stream list precedes the video
    # one — track fccType and only accept strf (and frame chunks) for
    # the 'vids' stream.
    stream_no = -1
    vid_stream: int | None = None
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        nonlocal width, height, bit_count, compression, top_down
        nonlocal usec_per_frame, stream_no, vid_stream
        for fourcc, p, size in _riff_chunks(data, start, end):
            if fourcc == b"LIST":
                walk(p + 4, p + size)  # skip the list-type fourcc
            elif fourcc == b"avih":
                (usec_per_frame,) = struct.unpack("<I", data[p:p + 4])
            elif fourcc == b"strh":
                stream_no += 1
                if data[p:p + 4] == b"vids" and vid_stream is None:
                    vid_stream = stream_no
            elif fourcc == b"strf" and (
                stream_no == vid_stream and width is None
            ):
                # BITMAPINFOHEADER: biSize, biWidth, biHeight, planes,
                # biBitCount, biCompression, ...
                _, w, h, _, bc, comp = struct.unpack(
                    "<IiiHHI", data[p:p + 20]
                )
                # biHeight < 0 declares a top-down DIB (rows already in
                # display order — no flip)
                width, height, top_down = w, abs(h), h < 0
                bit_count, compression = bc, comp
            elif fourcc[2:4] in (b"db", b"dc"):
                if vid_stream is not None and fourcc[:2].isdigit() and (
                    int(fourcc[:2]) != vid_stream
                ):
                    continue  # another stream's data chunk
                frames.append(data[p:p + size])

    walk(12, len(data))
    if width is None or not frames:
        raise ValueError("no video stream found in AVI")
    if compression != 0 or bit_count != 24:
        raise ValueError(
            f"unsupported AVI codec (biCompression={compression}, "
            f"biBitCount={bit_count}); only uncompressed 24-bit BI_RGB "
            "is decodable without a codec library"
        )
    row_stride = (width * 3 + 3) & ~3  # DIB rows pad to 4 bytes
    out = []
    for raw in frames:
        arr = np.frombuffer(raw[: row_stride * height], dtype=np.uint8)
        arr = arr.reshape(height, row_stride)[:, : width * 3]
        arr = arr.reshape(height, width, 3)
        if not top_down:
            arr = arr[::-1]  # bottom-up DIB -> display order
        arr = arr[:, :, ::-1]  # BGR -> RGB
        out.append(arr.tobytes())
    fps = 1e6 / usec_per_frame if usec_per_frame else 0.0
    return width, height, fps, out


def encode_avi(
    width: int, height: int, fps: float, frames: list[bytes]
) -> bytes:
    """Inverse of decode_avi (uncompressed 24-bit BI_RGB) — fixture
    builder and the re-encode side of frame pipelines.  `frames` are
    top-down RGB; rows are flipped/padded to the bottom-up BGR DIB the
    container stores."""
    row_stride = (width * 3 + 3) & ~3
    dibs = []
    for f in frames:
        arr = np.frombuffer(f, dtype=np.uint8).reshape(height, width, 3)
        arr = arr[::-1, :, ::-1]  # top-down RGB -> bottom-up BGR
        padded = np.zeros((height, row_stride), dtype=np.uint8)
        padded[:, : width * 3] = arr.reshape(height, width * 3)
        dibs.append(padded.tobytes())

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return (
            fourcc + struct.pack("<I", len(payload)) + payload
            + (b"\x00" if len(payload) & 1 else b"")
        )

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    usec = int(round(1e6 / fps)) if fps else 0
    frame_bytes = row_stride * height
    avih = struct.pack(
        "<14I",
        usec, frame_bytes * max(int(fps), 1), 0, 0x10,  # AVIF_HASINDEX off
        len(frames), 0, 1, frame_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"\x00" * 4  # fccType, fccHandler (none)
        + struct.pack("<10I", 0, 0, 0, 1, max(int(round(fps)), 1),
                      0, len(frames), frame_bytes, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, frame_bytes, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00db", d) for d in dibs))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
