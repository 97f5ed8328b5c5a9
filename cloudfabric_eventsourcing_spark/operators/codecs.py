"""Dependency-free media codecs: PNG, JPEG, WAV, AVI — pure Python + numpy.

The multimodal operators (operators/multimodal.py) need a real byte ->
pixels/samples step to be more than plumbing.  Full-blown image/audio
stacks (PIL, torchaudio, av) are not in this container, but the formats
that dominate checked-in fixtures, lossless pipelines, and real image
corpora are decodable from the spec with stdlib + numpy:

  * PNG: zlib-compressed filtered scanlines (ISO/IEC 15948).  Supported
    here: 8-bit grayscale / gray+alpha / RGB / RGBA / palette,
    non-interlaced, all five scanline filters (None/Sub/Up/Average/
    Paeth).  That covers everything a standard encoder with default
    settings emits; 16-bit decodes via high-byte downscale.  Sub-8-bit
    depths and Adam7 interlace raise cleanly.
  * JPEG: Huffman-coded JFIF — baseline/extended sequential (SOF0/1,
    single- or multi-scan) AND progressive (SOF2: spectral selection +
    successive approximation, T.81 Annex G); restart intervals
    honored; arithmetic-coded/lossless/12-bit raise cleanly (see the
    JPEG section below).
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
    alpha channel.  8-bit natively; 16-bit samples unfilter at their
    true byte width (the filters are byte-wise with bpp = channels x 2)
    and downscale to 8 via the high byte — the standard 16->8 mapping.
    Sub-8-bit and Adam7 interlace raise (see module docstring)."""
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
            if bit not in (8, 16) or (bit == 16 and color == 3):
                raise NotImplementedError(f"PNG bit depth {bit}")
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
    bps = bit // 8  # bytes per sample
    stride = w * channels * bps
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    rpos = 0
    bpp = channels * bps  # filter distance is in BYTES per pixel
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
    if bps == 2:
        # 16-bit samples are big-endian; the high byte IS round(v/257)
        # within 1 lsb — the standard 16->8 downscale
        out = out[0::2]
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


def dhash_bits(
    width: int, height: int, channels: int, pixels: bytes
) -> int:
    """64-bit difference hash (dHash, the pHash-family perceptual
    fingerprint): grayscale luminance, nearest-resize to a 9x8 grid,
    bit r*8+c = 1 iff the pixel right of (r, c) is strictly brighter.
    Scale-invariant by construction (any nearest-resize that lands on
    the same 9x8 samples hashes identically) and stable under
    brightness scaling (comparisons survive a positive gain).  Returned
    as a SIGNED 64-bit int so it stores in a Spark `long` column and
    composes with dedup.hamming_neardup_pairs."""
    arr = (
        np.frombuffer(pixels, np.uint8)
        .reshape(height, width, channels)
        .astype(np.float64)
    )
    if channels >= 3:
        lum = arr[..., 0] * 0.299 + arr[..., 1] * 0.587 + arr[..., 2] * 0.114
    else:
        lum = arr[..., 0]
    ys = (np.arange(8) * height) // 8
    xs = (np.arange(9) * width) // 9
    g = lum[ys][:, xs]
    bits = (g[:, 1:] > g[:, :-1]).flatten()
    h = np.uint64(0)
    for i in np.nonzero(bits)[0]:
        h |= np.uint64(1) << np.uint64(i)
    return int(np.int64(h))


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
# AVI (uncompressed RGB + Motion JPEG) — the video floor
#
# Inter-frame video (H.264 etc.) genuinely needs av/ffmpeg, but the
# RIFF/AVI container with uncompressed BI_RGB frames is parseable from
# the spec with struct alone — the same status WAV has on the audio
# side — and MJPG streams are per-frame baseline JPEGs, which the JPEG
# floor below decodes.  Uncompressed frames are stored as bottom-up
# 24-bit BGR DIBs with 4-byte-padded rows ('00db' chunks in the 'movi'
# list); decode flips to top-down RGB so the output composes directly
# with encode_png / image_features.  Inter-frame codecs (biCompression
# other than BI_RGB/MJPG) raise cleanly — that honesty boundary is
# documented at the multimodal operator.
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

    Supports the uncompressed-RGB profile (BITMAPINFOHEADER with
    biCompression == 0, 24 bits per pixel, frames in '00db'/'00dc'
    chunks) and Motion JPEG (biCompression == 'MJPG', each frame a
    standalone baseline JPEG decoded by decode_jpeg).  Raises
    ValueError on anything else — inter-frame codecs need a real
    decoder stack."""
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
            elif fourcc == b"strf" and width is None and (
                stream_no == vid_stream
                # structurally minimal AVIs omit strh entirely; a strf
                # seen before ANY strh can only be the video format
                # (there is no audio stream it could belong to), so the
                # pre-r8 first-strf behavior is kept for that case (r8
                # advice).  Once a strh has appeared, only the declared
                # 'vids' stream's strf is trusted — a WAVEFORMATEX after
                # an 'auds' strh must never parse as a BITMAPINFOHEADER.
                or (vid_stream is None and stream_no == -1)
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
    if compression == 0x47504A4D:  # 'MJPG' — Motion JPEG
        # each frame chunk is a standalone baseline JPEG (decode_jpeg
        # below); grayscale frames replicate to RGB so the output
        # composes with encode_png / image_features like the RGB path
        out = []
        for raw in frames:
            fw, fh, fch, px = decode_jpeg(raw)
            if (fw, fh) != (width, height):
                raise ValueError(
                    f"MJPEG frame {fw}x{fh} mismatches container "
                    f"{width}x{height}"
                )
            if fch == 1:
                arr = np.frombuffer(px, np.uint8)
                px = np.repeat(arr, 3).tobytes()
            out.append(px)
        fps = 1e6 / usec_per_frame if usec_per_frame else 0.0
        return width, height, fps, out
    if compression != 0 or bit_count != 24:
        raise ValueError(
            f"unsupported AVI codec (biCompression={compression}, "
            f"biBitCount={bit_count}); only uncompressed 24-bit BI_RGB "
            "and MJPG are decodable without a codec library"
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
    width: int,
    height: int,
    fps: float,
    frames: list[bytes],
    codec: str = "rgb",
    quality: int = 85,
) -> bytes:
    """Inverse of decode_avi — fixture builder and the re-encode side of
    frame pipelines.  `frames` are top-down RGB.  codec="rgb" stores
    uncompressed bottom-up BGR DIBs (lossless); codec="mjpeg" stores
    each frame as a standalone baseline JPEG (encode_jpeg, lossy —
    Motion JPEG, what real capture pipelines emit when they avoid
    inter-frame codecs)."""
    if codec not in ("rgb", "mjpeg"):
        raise ValueError("codec must be 'rgb' or 'mjpeg'")
    row_stride = (width * 3 + 3) & ~3
    payloads = []
    for f in frames:
        if codec == "mjpeg":
            payloads.append(encode_jpeg(width, height, 3, f, quality=quality))
            continue
        arr = np.frombuffer(f, dtype=np.uint8).reshape(height, width, 3)
        arr = arr[::-1, :, ::-1]  # top-down RGB -> bottom-up BGR
        padded = np.zeros((height, row_stride), dtype=np.uint8)
        padded[:, : width * 3] = arr.reshape(height, width * 3)
        payloads.append(padded.tobytes())

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return (
            fourcc + struct.pack("<I", len(payload)) + payload
            + (b"\x00" if len(payload) & 1 else b"")
        )

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    usec = int(round(1e6 / fps)) if fps else 0
    frame_bytes = row_stride * height
    mjpeg = codec == "mjpeg"
    handler = b"MJPG" if mjpeg else b"\x00" * 4
    bi_compression = 0x47504A4D if mjpeg else 0
    avih = struct.pack(
        "<14I",
        usec, frame_bytes * max(int(fps), 1), 0, 0x10,  # AVIF_HASINDEX off
        len(frames), 0, 1, frame_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + handler  # fccType, fccHandler
        + struct.pack("<10I", 0, 0, 0, 1, max(int(round(fps)), 1),
                      0, len(frames), frame_bytes, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, bi_compression, frame_bytes, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    # compressed frames use '00dc' per the RIFF convention, DIBs '00db'
    data_fcc = b"00dc" if mjpeg else b"00db"
    movi = lst(b"movi", b"".join(chunk(data_fcc, d) for d in payloads))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


# ---------------------------------------------------------------------------
# JPEG (baseline JFIF) — the lossy-image floor
#
# Real image corpora are overwhelmingly JPEG, so a PNG-only floor leaves
# the dominant format undecodable wherever PIL is not installed.  The
# Huffman-coded profiles — baseline/extended sequential (SOF0/1) and
# progressive (SOF2, T.81 Annex G: spectral selection + successive
# approximation) — are decodable from the spec with struct + numpy, same
# status as the PNG/WAV/AVI decoders above: every scan folds entropy-
# decoded coefficients into per-component accumulators (a per-block
# Python loop — this is the hermetic floor, not the fast path; PIL is
# preferred when importable), and ONE batched numpy pass at EOI runs
# dequantization, the 2-D IDCT, chroma upsampling, and YCbCr->RGB over
# all blocks at once.  Arithmetic-coded (SOF9+), lossless,
# hierarchical, and 12-bit variants raise cleanly.
# ---------------------------------------------------------------------------

# zigzag index i -> natural (row-major) index within the 8x8 block
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# 8x8 DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16); spatial =
# A.T @ coeff @ A, coeff = A @ spatial @ A.T (orthonormal)
def _dct_basis() -> "np.ndarray":
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    a = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    a[0, :] *= 1 / np.sqrt(2)
    return a


_DCT_A = _dct_basis()

# unsupported SOF markers -> honest failure text (SOF2 progressive is
# SUPPORTED since r8)
_SOF_UNSUPPORTED = {
    0xC3: "lossless JPEG (SOF3)",
    0xC5: "differential sequential JPEG (SOF5)",
    0xC6: "differential progressive JPEG (SOF6)",
    0xC7: "differential lossless JPEG (SOF7)",
    0xC9: "arithmetic-coded JPEG (SOF9)",
    0xCA: "arithmetic-coded progressive JPEG (SOF10)",
    0xCB: "arithmetic-coded lossless JPEG (SOF11)",
    0xCD: "differential arithmetic JPEG (SOF13)",
    0xCE: "differential arithmetic progressive JPEG (SOF14)",
    0xCF: "differential arithmetic lossless JPEG (SOF15)",
}


def is_jpeg(data: bytes) -> bool:
    return data[:2] == b"\xff\xd8"


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; restart markers are consumed explicitly by the MCU loop
    (expect_rst), never silently skipped."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.p = pos
        self.buf = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            b = self.d[self.p]
            self.p += 1
            if b == 0xFF:
                nxt = self.d[self.p]
                if nxt == 0x00:
                    self.p += 1  # stuffed 0xFF data byte
                else:
                    # marker inside entropy data: per T.81 the decoder
                    # pads with 1-bits to finish the current scan; any
                    # structural overrun surfaces as a Huffman error
                    self.p -= 1
                    b = 0xFF
            self.buf = b
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_and_expect_rst(self, idx: int) -> None:
        self.n = 0  # byte-align
        if self.d[self.p] == 0xFF and self.d[self.p + 1] == 0xD0 + (idx & 7):
            self.p += 2
        else:
            raise ValueError("JPEG restart marker missing/misplaced")


def _huff_decode(reader: _JpegBitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """DC/AC magnitude decode (T.81 F.2.2.1 EXTEND)."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _build_huff(bits: list, vals: list) -> dict:
    """Canonical Huffman: (length, code) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _wrap32(x: int) -> int:
    """Wrap an unbounded Python int to int32 two's-complement.  Corrupt
    streams can run the DC predictor to arbitrary magnitude, and
    assigning that into the int32 coef array relied on numpy's
    (deprecated) silent wraparound — a future numpy raises
    OverflowError there, escaping the codec's ValueError taxonomy.
    Valid JPEG DC values never leave int32 range, so this changes
    corrupt-input behavior only (same wrapped garbage, minus the
    warning)."""
    x &= 0xFFFFFFFF
    return x - 0x100000000 if x >= 0x80000000 else x


def _block_sequential(reader, dc_t, ac_t, coef, preds, ci) -> None:
    """One full baseline block (DC diff + run-length AC) into `coef`
    (length-64 natural-order array)."""
    s = _huff_decode(reader, dc_t)
    preds[ci] = _wrap32(preds[ci] + (_extend(reader.bits(s), s) if s else 0))
    coef[0] = preds[ci]
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC index overrun")
        coef[_ZIGZAG[k]] = _extend(reader.bits(s), s)
        k += 1


def _block_ac_first(reader, ac_t, coef, ss, se, al, eobrun) -> None:
    """Progressive AC first scan (T.81 G.1.2.2): run-length symbols with
    EOBn end-of-band runs; values land shifted by the scan's Al."""
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun[0] = (1 << r) - 1 + (reader.bits(r) if r else 0)
            return
        k += r
        if k > se:
            raise ValueError("JPEG AC band overrun")
        coef[_ZIGZAG[k]] = _extend(reader.bits(s), s) << al
        k += 1


def _refine_nonzero(reader, coef, z, p1) -> None:
    """One correction bit for an already-nonzero coefficient: append the
    magnitude bit if it is not set (values are multiples of p1, so the
    two's-complement test on the signed int equals the magnitude
    test)."""
    if reader.bit() and (abs(coef[z]) & p1) == 0:
        coef[z] += p1 if coef[z] >= 0 else -p1


def _block_ac_refine(reader, ac_t, coef, ss, se, al, eobrun) -> None:
    """Progressive AC refinement scan (T.81 G.1.2.3, the libjpeg
    jdphuff structure): new ±1<<Al coefficients interleave with
    correction bits for every nonzero-history coefficient passed over;
    EOBn covers whole blocks whose remaining nonzeros still receive
    correction bits."""
    p1 = 1 << al
    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = _huff_decode(reader, ac_t)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun[0] = (1 << r) + (reader.bits(r) if r else 0)
                    break
                # r == 15 (ZRL): advance over 16 zero-HISTORY coeffs
            else:
                if s != 1:
                    raise ValueError("JPEG AC refine symbol must have s=1")
                val = p1 if reader.bit() else -p1
            while k <= se:
                z = _ZIGZAG[k]
                if coef[z] != 0:
                    _refine_nonzero(reader, coef, z, p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[_ZIGZAG[k]] = val
            k += 1
    if eobrun[0] > 0:
        while k <= se:
            z = _ZIGZAG[k]
            if coef[z] != 0:
                _refine_nonzero(reader, coef, z, p1)
            k += 1
        eobrun[0] -= 1


def _decode_jpeg_scan(
    data, pos, comps, scan, huff, restart, coefs,
    progressive, ss, se, ah, al, mcux, mcuy, hmax, vmax, w, h,
) -> int:
    """Decode ONE scan's entropy data into the coefficient arrays;
    returns the byte position of the next marker.  Handles interleaved
    (MCU-ordered) and single-component (raster-ordered over the
    component's own block grid) scans, sequential and progressive."""
    ci_by_cid = {c[0]: i for i, c in enumerate(comps)}
    scan_cis = [ci_by_cid[cid] for cid, _, _ in scan]
    tables = {ci_by_cid[cid]: (dc, ac) for cid, dc, ac in scan}
    reader = _JpegBitReader(data, pos)
    preds = [0] * len(comps)
    eobrun = [0]
    rst_idx = 0
    units = 0

    def decode_block(ci, by, bx) -> None:
        coef = coefs[ci][by, bx]
        dc_id, ac_id = tables[ci]
        if not progressive:
            _block_sequential(
                reader, huff[(0, dc_id)], huff[(1, ac_id)], coef, preds, ci
            )
        elif ss == 0:
            if ah == 0:  # DC first: diff coded in the >>Al domain
                s = _huff_decode(reader, huff[(0, dc_id)])
                preds[ci] = _wrap32(
                    preds[ci] + (_extend(reader.bits(s), s) if s else 0)
                )
                coef[0] = _wrap32(preds[ci] << al)
            elif reader.bit():  # DC refinement: one appended bit
                coef[0] |= 1 << al
        elif ah == 0:
            _block_ac_first(reader, huff[(1, ac_id)], coef, ss, se, al, eobrun)
        else:
            _block_ac_refine(reader, huff[(1, ac_id)], coef, ss, se, al, eobrun)

    def maybe_restart() -> None:
        nonlocal rst_idx, preds
        if restart and units and units % restart == 0:
            reader.align_and_expect_rst(rst_idx)
            rst_idx += 1
            preds = [0] * len(comps)
            eobrun[0] = 0

    if len(scan) > 1:
        # interleaved: MCU geometry over the full frame grid
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for ci in scan_cis:
                    _, hi, vi, _ = comps[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            decode_block(ci, my * vi + by, mx * hi + bx)
                units += 1
    else:
        # single component: raster over ITS ceil-divided block grid
        # (T.81 A.2.2 — NOT the MCU-padded grid the interleaved path uses)
        ci = scan_cis[0]
        _, hi, vi, _ = comps[ci]
        cw = -(-w * hi // hmax)
        ch = -(-h * vi // vmax)
        bw = -(-cw // 8)
        bh = -(-ch // 8)
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                decode_block(ci, by, bx)
                units += 1
    # resync to the next marker (skip entropy padding and any RSTs)
    pos = reader.p
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] != 0x00 and not (
            0xD0 <= data[pos + 1] <= 0xD7
        ):
            break
        pos += 1
    return pos


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """JFIF bytes -> (width, height, channels, raw row-major pixels).

    Huffman-coded sequential (SOF0/SOF1, single- or multi-scan) AND
    progressive (SOF2: spectral selection + successive approximation,
    T.81 Annex G) profiles.  3-component scans decode as YCbCr -> RGB
    (BT.601 / JFIF constants); 1-component as grayscale.  Subsampling
    supported for any integer-ratio factors (4:4:4, 4:2:2, 4:2:0,
    4:1:1) via replication upsampling.  Restart intervals honored.
    Arithmetic-coded / lossless / hierarchical / 12-bit variants raise
    NotImplementedError (see module note)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad SOI)")
    qt: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None  # list of (id, h, v, tq)
    w = h = None
    restart = 0
    pos = 2
    progressive = False
    coefs: list = []
    hmax = vmax = mcux = mcuy = 0
    saw_scan = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        # T.81 B.1.1.2: any marker may be preceded by extra 0xFF fill
        # bytes — skip them (a 0xFF second byte is fill, not a marker)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        m = data[pos + 1]
        pos += 2
        if m == 0xD8 or 0xD0 <= m <= 0xD7 or m == 0x01:
            continue
        if m == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        pos += seglen
        if m == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq_id = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq:
                    vals = struct.unpack(">64H", seg[i:i + 128])
                    i += 128
                else:
                    vals = struct.unpack("64B", seg[i:i + 64])
                    i += 64
                nat = np.zeros(64, np.int32)
                for zz, natidx in enumerate(_ZIGZAG):
                    nat[natidx] = vals[zz]
                qt[tq_id] = nat.reshape(8, 8)
        elif m in (0xC0, 0xC1, 0xC2):  # baseline / ext. sequential / progressive
            progressive = m == 0xC2
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG (only 8)")
            h, w = struct.unpack(">HH", seg[1:5])
            n = seg[5]
            comps = []
            if n < 1:
                raise ValueError("corrupt JPEG: SOF declares 0 components")
            for c in range(n):
                cid, hv, tq_id = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq_id))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for _, hi, vi, _ in comps:
                # T.81 B.2.2: Hi/Vi are 1..4; a corrupt 0 would divide by
                # zero in the ratio check and the MCU geometry below
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(
                        f"corrupt JPEG: sampling factor {hi}x{vi} "
                        "outside T.81 range 1..4"
                    )
                if hmax % hi or vmax % vi:
                    raise NotImplementedError(
                        f"non-integer chroma sampling ratio {hi}x{vi} "
                        f"vs {hmax}x{vmax}"
                    )
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            # per-component coefficient accumulators over the MCU-padded
            # block grid; every scan folds into these, IDCT runs once at
            # the end (this is what makes multi-scan/progressive a pure
            # extension of the baseline path)
            coefs = [
                np.zeros((mcuy * vi, mcux * hi, 64), np.int32)
                for _, hi, vi, _ in comps
            ]
        elif m in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                _SOF_UNSUPPORTED[m] + " needs a full codec stack"
            )
        elif m == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                huff[(tc, th)] = _build_huff(bits, vals)
                i += 17 + nv
        elif m == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS header + entropy data
            if comps is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c:3 + 2 * c]
                scan.append((cid, tt >> 4, tt & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if progressive:
                # T.81 G.1: DC scans cover exactly band 0; AC scans
                # cover a band inside 1..63 for ONE component
                if ss == 0 and se != 0:
                    raise ValueError("progressive DC scan must have Se=0")
                if ss > 0 and (ns != 1 or se < ss or se > 63):
                    raise ValueError(
                        "progressive AC scan must be single-component "
                        "with 1 <= Ss <= Se <= 63"
                    )
            pos = _decode_jpeg_scan(
                data, pos, comps, scan, huff, restart, coefs,
                progressive, ss, se, ah, al, mcux, mcuy, hmax, vmax, w, h,
            )
            saw_scan = True
    if comps is None or not saw_scan or w is None:
        raise ValueError("JPEG missing SOF/SOS")
    # batched dequantize + IDCT per component over the accumulated grids
    out_planes = []
    for ci, (cid, hi, vi, tq_id) in enumerate(comps):
        grid = coefs[ci]
        nby, nbx = grid.shape[0], grid.shape[1]
        blocks = grid.reshape(-1, 8, 8).astype(np.float64) * qt[tq_id]
        spatial = np.einsum(
            "ui,nuv,vj->nij", _DCT_A, blocks, _DCT_A, optimize=True
        ) + 128.0
        plane = (
            spatial.reshape(nby, nbx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nby * 8, nbx * 8)
        )
        # crop to the component's true resolution, then replicate up
        cw = -(-w * hi // hmax)
        ch = -(-h * vi // vmax)
        plane = plane[:ch, :cw]
        plane = np.repeat(
            np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
        )[:h, :w]
        out_planes.append(plane)
    if len(out_planes) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, gray.tobytes()
    if len(out_planes) != 3:
        raise NotImplementedError(f"{len(out_planes)}-component JPEG")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()


# standard quantization tables (T.81 Annex K.1), natural (row-major) order
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.int32).reshape(8, 8)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.int32).reshape(8, 8)

# standard Huffman tables (T.81 Annex K.3): (BITS list, HUFFVAL list)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)


def _huff_encode_table(bits: list, vals: list) -> dict:
    """Canonical Huffman for the ENCODER: symbol -> (code, length)."""
    enc = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


class _JpegBitWriter:
    """MSB-first bit writer with 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)
                self.buf = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)

    def restart(self, idx: int) -> None:
        """Byte-align (1-pad) and emit RSTn — T.81 restart markers sit
        unstuffed between entropy segments."""
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)
        self.out += bytes([0xFF, 0xD0 + (idx & 7)])


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category s, s-bit two's-complement-style code)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, v if v > 0 else v + (1 << s) - 1


def _scaled_q(base: "np.ndarray", quality: int) -> "np.ndarray":
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def encode_jpeg(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(w, h, channels, raw pixels) -> baseline JFIF bytes.  channels 1
    (grayscale) or 3 (RGB, encoded YCbCr — 4:4:4 by default, 4:2:0 with
    ``subsample=True``).  Standard Annex K quantization (IJG quality
    scaling) + Huffman tables; ``restart_interval=N`` emits DRI + RSTn
    markers every N MCUs.  The fixture builder and re-encode side of
    decode_jpeg — lossy by nature, so round-trip tests assert
    closeness, not equality."""
    if channels not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    arr = np.frombuffer(pixels, np.uint8).reshape(height, width, channels)
    arr = arr.astype(np.float64)
    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        qtabs = [0, 1, 1]
        htabs = [0, 1, 1]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
        if subsample:
            # 4:2:0 chroma: pad to even dims (edge), 2x2 box mean
            for ci in (1, 2):
                p = comps[ci]
                p = np.pad(
                    p, ((0, p.shape[0] & 1), (0, p.shape[1] & 1)), mode="edge"
                )
                comps[ci] = (
                    p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]
                ) / 4.0
    else:
        comps = [arr[..., 0]]
        qtabs = [0]
        htabs = [0]
        samp = [(1, 1)]
    q0 = _scaled_q(_Q_LUMA, quality)
    q1 = _scaled_q(_Q_CHROMA, quality)
    qts = [q0, q1]
    dc_enc = [
        _huff_encode_table(*_HUFF_DC_LUMA),
        _huff_encode_table(*_HUFF_DC_CHROMA),
    ]
    ac_enc = [
        _huff_encode_table(*_HUFF_AC_LUMA),
        _huff_encode_table(*_HUFF_AC_CHROMA),
    ]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    # pad each component plane (edge replication — minimizes ringing at
    # image borders) to its MCU-aligned block grid
    padded = []
    for ci, plane in enumerate(comps):
        hi, vi = samp[ci]
        ph, pw = mcuy * vi * 8, mcux * hi * 8
        padded.append(
            np.pad(
                plane,
                ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                mode="edge",
            )
        )
    writer = _JpegBitWriter()
    preds = [0] * len(comps)
    inv_zig = list(_ZIGZAG)  # zigzag position -> natural index

    def emit_block(block: "np.ndarray", ci: int) -> None:
        coeff = _DCT_A @ (block - 128.0) @ _DCT_A.T
        qc = np.round(coeff / qts[qtabs[ci]]).astype(np.int64)
        flat = qc.reshape(-1)
        zz = [int(flat[inv_zig[i]]) for i in range(64)]
        diff = zz[0] - preds[ci]
        preds[ci] = zz[0]
        s, code = _magnitude(diff)
        hc, hl = dc_enc[htabs[ci]][s]
        writer.write(hc, hl)
        if s:
            writer.write(code, s)
        run = 0
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                hc, hl = ac_enc[htabs[ci]][0xF0]  # ZRL
                writer.write(hc, hl)
                run -= 16
            s, code = _magnitude(zz[k])
            hc, hl = ac_enc[htabs[ci]][(run << 4) | s]
            writer.write(hc, hl)
            writer.write(code, s)
            run = 0
        if last_nz < 63:
            hc, hl = ac_enc[htabs[ci]][0x00]  # EOB
            writer.write(hc, hl)

    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                writer.restart(rst_idx)
                rst_idx += 1
                preds = [0] * len(comps)
            for ci, plane in enumerate(padded):
                hi, vi = samp[ci]
                for by in range(vi):
                    for bx in range(hi):
                        r0 = (my * vi + by) * 8
                        c0 = (mx * hi + bx) * 8
                        emit_block(plane[r0:r0 + 8, c0:c0 + 8], ci)
            mcu_count += 1
    entropy = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def dqt(tid: int, q: "np.ndarray") -> bytes:
        zz = bytes(int(q.reshape(-1)[inv_zig[i]]) for i in range(64))
        return seg(0xDB, bytes([tid]) + zz)

    def dht(tc: int, th: int, table: tuple) -> bytes:
        bits, vals = table
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, q0)
    if channels == 3:
        out += dqt(1, q1)
    sof = bytearray([8]) + struct.pack(">HH", height, width) + bytes([channels])
    for ci in range(channels):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, qtabs[ci]])
    out += seg(0xC0, bytes(sof))
    out += dht(0, 0, _HUFF_DC_LUMA)
    out += dht(1, 0, _HUFF_AC_LUMA)
    if channels == 3:
        out += dht(0, 1, _HUFF_DC_CHROMA)
        out += dht(1, 1, _HUFF_AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([channels])
    for ci in range(channels):
        sos += bytes([ci + 1, (htabs[ci] << 4) | htabs[ci]])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, bytes(sos))
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF (ISO 14496-12) — container demux for Motion-JPEG tracks
#
# Real corpora carry video in MP4/MOV containers far more often than in
# RIFF/AVI.  The box structure is simple length-prefixed nesting, so the
# demux side is hermetically parseable: walk moov ▸ trak ▸ mdia ▸ minf ▸
# stbl, take the first VIDEO track whose sample entry is a JPEG family
# fourcc ('jpeg'/'mjpa'/'mjpb', the QuickTime Motion-JPEG forms), locate
# every sample via the stsz/stsc/stco(co64) tables, and decode each
# sample with decode_jpeg.  Inter-frame sample entries (avc1/hvc1/vp09/av01)
# raise the same honest boundary as AVI — that is what the operators'
# decoder= injection point is for.
# ---------------------------------------------------------------------------

def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _mp4_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) walking a box body."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        fourcc = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize follows the fourcc
            if pos + 16 > end:
                raise ValueError("malformed MP4 box (truncated largesize)")
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("malformed MP4 box")
        yield fourcc, body, pos + size
        pos += size


def _mp4_find(data: bytes, start: int, end: int, path: list[bytes]):
    """First box at the given nesting path; (payload_start, payload_end)
    or None."""
    if not path:
        return start, end
    for fourcc, b, e in _mp4_boxes(data, start, end):
        if fourcc == path[0]:
            return _mp4_find(data, b, e, path[1:])
    return None


_MP4_JPEG_ENTRIES = (b"jpeg", b"mjpa", b"mjpb")


def decode_mp4(data: bytes) -> tuple[int, int, float, list[bytes]]:
    """MP4/MOV bytes -> (width, height, fps, [top-down RGB frames]) for
    Motion-JPEG tracks.  Sample offsets come from the stsz/stsc/stco
    (or co64) tables — mdat is never assumed contiguous or in track
    order.  fps is timescale/delta from mdhd+stts (0.0 when stts is
    empty).  Raises ValueError for non-JPEG sample entries (inter-frame
    codecs need a real decoder stack — use the operators' decoder=
    injection) and for structurally broken files — including truncated
    ones: struct-level underruns are rewrapped so the documented
    except-ValueError contract (and every on_error policy built on it)
    holds for arbitrary corrupt bytes."""
    if not is_mp4(data):
        raise ValueError("not an MP4/ISO-BMFF file")
    try:
        return _decode_mp4_body(data)
    except struct.error as exc:
        raise ValueError(f"truncated MP4 structure: {exc}") from exc


def _decode_mp4_body(data: bytes) -> tuple[int, int, float, list[bytes]]:
    moov = _mp4_find(data, 0, len(data), [b"moov"])
    if moov is None:
        raise ValueError("no moov box in MP4")

    chosen = None  # (stbl span, mdhd span, entry fourcc, width, height)
    rejected_entries = []
    for fourcc, tb, te in _mp4_boxes(data, *moov):
        if fourcc != b"trak":
            continue
        mdia = _mp4_find(data, tb, te, [b"mdia"])
        if mdia is None:
            continue
        hdlr = _mp4_find(data, *mdia, [b"hdlr"])
        if hdlr is None or data[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        stbl = _mp4_find(data, *mdia, [b"minf", b"stbl"])
        stsd = stbl and _mp4_find(data, *stbl, [b"stsd"])
        if not stsd:
            continue
        # stsd payload: version/flags (4) + entry_count (4), then sample
        # entries, each a box whose fourcc is the codec
        entry_start = stsd[0] + 8
        (esize,) = struct.unpack(">I", data[entry_start:entry_start + 4])
        entry_fcc = data[entry_start + 4:entry_start + 8]
        if entry_fcc not in _MP4_JPEG_ENTRIES:
            rejected_entries.append(entry_fcc.decode("latin1"))
            continue
        # VisualSampleEntry: 6 reserved + 2 data_reference_index + 16
        # pre_defined/reserved, then width/height (16-bit each)
        geo = entry_start + 8 + 6 + 2 + 16
        w, h = struct.unpack(">HH", data[geo:geo + 4])
        mdhd = _mp4_find(data, *mdia, [b"mdhd"])
        chosen = (stbl, mdhd, entry_fcc, w, h)
        break
    if chosen is None:
        if rejected_entries:
            raise ValueError(
                f"unsupported MP4 video codec(s) {rejected_entries}; only "
                "Motion-JPEG tracks (jpeg/mjpa/mjpb) decode without a codec "
                "library — inject decoder= for inter-frame formats"
            )
        raise ValueError("no video track found in MP4")
    stbl, mdhd, _fcc, width, height = chosen

    def full_box(name: bytes):
        span = _mp4_find(data, *stbl, [name])
        return span

    # sample sizes — every count is validated against the BOX (and the
    # file) before a list is materialized: a corrupt stsz header can
    # carry count=0xFFFFFFFF, and '[uniform] * count' would allocate
    # tens of GB before any consistency check, OOM-killing the executor
    # (an OS kill that on_error="skip" cannot catch)
    stsz = full_box(b"stsz")
    if stsz is None:
        raise ValueError("MP4 video track has no stsz box")
    uniform, count = struct.unpack(">II", data[stsz[0] + 4:stsz[0] + 12])
    if uniform:
        if uniform * count > len(data):
            raise ValueError(
                "MP4 stsz sizes exceed the file (corrupt sample table)"
            )
        sizes = [uniform] * count
    else:
        if stsz[0] + 12 + 4 * count > stsz[1]:
            raise ValueError(
                "MP4 stsz count exceeds its box (corrupt sample table)"
            )
        sizes = list(struct.unpack(
            f">{count}I", data[stsz[0] + 12:stsz[0] + 12 + 4 * count]
        ))

    # chunk offsets (stco 32-bit or co64 64-bit)
    stco = full_box(b"stco")
    if stco is not None:
        (n_chunks,) = struct.unpack(">I", data[stco[0] + 4:stco[0] + 8])
        if stco[0] + 8 + 4 * n_chunks > stco[1]:
            raise ValueError(
                "MP4 stco count exceeds its box (corrupt sample table)"
            )
        offsets = list(struct.unpack(
            f">{n_chunks}I", data[stco[0] + 8:stco[0] + 8 + 4 * n_chunks]
        ))
    else:
        co64 = full_box(b"co64")
        if co64 is None:
            raise ValueError("MP4 video track has no stco/co64 box")
        (n_chunks,) = struct.unpack(">I", data[co64[0] + 4:co64[0] + 8])
        if co64[0] + 8 + 8 * n_chunks > co64[1]:
            raise ValueError(
                "MP4 co64 count exceeds its box (corrupt sample table)"
            )
        offsets = list(struct.unpack(
            f">{n_chunks}Q", data[co64[0] + 8:co64[0] + 8 + 8 * n_chunks]
        ))

    # sample-to-chunk runs: (first_chunk, samples_per_chunk, desc_index)
    stsc = full_box(b"stsc")
    if stsc is None:
        raise ValueError("MP4 video track has no stsc box")
    (n_runs,) = struct.unpack(">I", data[stsc[0] + 4:stsc[0] + 8])
    if stsc[0] + 8 + 12 * n_runs > stsc[1]:
        raise ValueError(
            "MP4 stsc count exceeds its box (corrupt sample table)"
        )
    runs = [
        struct.unpack(">III", data[stsc[0] + 8 + 12 * i:stsc[0] + 20 + 12 * i])
        for i in range(n_runs)
    ]
    # ISO 14496-12: the first run starts at chunk 1 and first_chunk is
    # strictly increasing.  Expanding a non-conformant table would
    # silently assign samples-per-chunk to the WRONG chunks — walking
    # wrong offsets yields misleading 'corrupt sample' errors at best
    # and wrong pixels (hence a wrong dedup embedding) at worst.
    if runs and runs[0][0] != 1:
        raise ValueError(
            "MP4 sample tables inconsistent (stsc first run does not "
            "start at chunk 1)"
        )
    for i in range(1, len(runs)):
        if runs[i][0] <= runs[i - 1][0]:
            raise ValueError(
                "MP4 sample tables inconsistent (stsc first_chunk not "
                "increasing)"
            )

    # expand runs -> samples-per-chunk for each chunk, then walk chunks
    # accumulating intra-chunk offsets (samples are contiguous in chunk)
    spc = []
    for i, (first, per, _desc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else len(offsets)
        spc.extend([per] * (last - first + 1))
    sample_spans = []
    si = 0
    for ci, chunk_off in enumerate(offsets):
        pos = chunk_off
        for _ in range(spc[ci] if ci < len(spc) else 0):
            if si >= len(sizes):
                break
            if pos + sizes[si] > len(data):
                raise ValueError(
                    "MP4 sample extends past end of file (corrupt "
                    "sample table)"
                )
            sample_spans.append((pos, sizes[si]))
            pos += sizes[si]
            si += 1
    if si < len(sizes):
        raise ValueError("MP4 sample tables inconsistent (stsc/stco short)")

    # fps: mdhd timescale over the (assumed-constant) stts delta
    fps = 0.0
    if mdhd is not None:
        version = data[mdhd[0]]
        ts_off = mdhd[0] + (20 if version == 1 else 12)
        (timescale,) = struct.unpack(">I", data[ts_off:ts_off + 4])
        stts = full_box(b"stts")
        if stts is not None:
            (n_stts,) = struct.unpack(">I", data[stts[0] + 4:stts[0] + 8])
            if n_stts >= 1:
                _cnt, delta = struct.unpack(
                    ">II", data[stts[0] + 8:stts[0] + 16]
                )
                if delta:
                    fps = timescale / delta

    frames = []
    for off, size in sample_spans:
        fw, fh, fch, px = decode_jpeg(data[off:off + size])
        if (fw, fh) != (width, height):
            raise ValueError(
                f"MJPEG sample {fw}x{fh} mismatches track {width}x{height}"
            )
        if fch == 1:
            arr = np.frombuffer(px, np.uint8)
            px = np.repeat(arr, 3).tobytes()
        frames.append(px)
    return width, height, fps, frames


def encode_mp4(
    width: int, height: int, fps: float, frames: list[bytes],
    quality: int = 85,
) -> bytes:
    """Inverse of decode_mp4 — fixture builder: top-down RGB frames ->
    a minimal ISO-BMFF file with one 'jpeg' video track (each sample an
    encode_jpeg baseline JPEG), ftyp + mdat + moov with the full
    stsd/stts/stsc/stsz/stco chain.  Samples are split across TWO mdat
    chunks when there are >=2 frames, so decoders that shortcut the
    chunk tables fail loudly."""
    samples = [encode_jpeg(width, height, 3, f, quality=quality) for f in frames]

    def box(fourcc: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + fourcc + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    # split samples into two chunks (second chunk = last sample)
    split = max(len(samples) - 1, 1)
    chunk1, chunk2 = samples[:split], samples[split:]
    mdat1 = box(b"mdat", b"".join(chunk1))
    mdat2 = box(b"mdat", b"".join(chunk2)) if chunk2 else b""
    chunk1_off = len(ftyp) + 8
    chunk2_off = len(ftyp) + len(mdat1) + 8

    timescale = 1000
    delta = int(round(timescale / fps)) if fps else 0
    duration = delta * len(samples)

    def full(fourcc: bytes, version_flags: int, payload: bytes) -> bytes:
        return box(fourcc, struct.pack(">I", version_flags) + payload)

    entry = (
        struct.pack(">I", 86) + b"jpeg"
        + b"\x00" * 6 + struct.pack(">H", 1)       # reserved + dref index
        + b"\x00" * 16                              # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0) + struct.pack(">H", 1)  # reserved, frame_count
        + b"\x05MJPEG" + b"\x00" * 26               # compressor name (32)
        + struct.pack(">Hh", 24, -1)                # depth, color table id
    )
    stsd = full(b"stsd", 0, struct.pack(">I", 1) + entry)
    stts = full(b"stts", 0, struct.pack(">III", 1, len(samples), delta or 1))
    if chunk2:
        stsc = full(
            b"stsc", 0,
            struct.pack(">I", 2)
            + struct.pack(">III", 1, len(chunk1), 1)
            + struct.pack(">III", 2, len(chunk2), 1),
        )
        stco = full(b"stco", 0, struct.pack(">III", 2, chunk1_off, chunk2_off))
    else:
        stsc = full(b"stsc", 0, struct.pack(">I", 1)
                    + struct.pack(">III", 1, len(chunk1), 1))
        stco = full(b"stco", 0, struct.pack(">II", 1, chunk1_off))
    stsz = full(
        b"stsz", 0,
        struct.pack(">II", 0, len(samples))
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    url = full(b"url ", 1, b"")  # flag 1: data in this file
    dref = full(b"dref", 0, struct.pack(">I", 1) + url)
    dinf = box(b"dinf", dref)
    vmhd = full(b"vmhd", 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = box(b"minf", vmhd + dinf + stbl)
    hdlr = full(b"hdlr", 0, struct.pack(">I", 0) + b"vide"
                + b"\x00" * 12 + b"Video\x00")
    mdhd = full(b"mdhd", 0, struct.pack(">IIIIHH", 0, 0, timescale,
                                        duration, 0x55C4, 0))
    mdia = box(b"mdia", mdhd + hdlr + minf)
    tkhd = full(b"tkhd", 7, struct.pack(">IIII", 0, 0, 1, 0)
                + struct.pack(">IQ", 0, 0)
                + struct.pack(">HHHH", 0, 0, 0, 0)
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                              0x40000000)
                + struct.pack(">II", width << 16, height << 16))
    trak = box(b"trak", tkhd + mdia)
    mvhd = full(b"mvhd", 0, struct.pack(">IIII", 0, 0, timescale, duration)
                + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                              0x40000000)
                + b"\x00" * 24 + struct.pack(">I", 2))
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat1 + mdat2 + moov
