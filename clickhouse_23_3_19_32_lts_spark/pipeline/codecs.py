"""Pure-Python decoders for the self-describing media containers whose
formats need no codec library: BMP (uncompressed 24/32-bit BI_RGB), PPM
(P6 binary / P3 ASCII, maxval <= 255) and WAV (RIFF PCM 8/16-bit).

These make pipeline/multimodal.py's decode path real for at least these
containers (the environment has no PIL/opencv/ffmpeg; JPEG/PNG/MP4 remain
stubbed). Encoders exist so tests can roundtrip generated fixtures.

Formats are decoded from their public specifications:
  - BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, little-endian, 4-byte row
    padding, bottom-up rows unless height < 0, BGR(A) sample order.
  - PPM: netpbm "P6"/"P3" header (whitespace/comment separated tokens),
    RGB sample order.
  - WAV: RIFF 'WAVE' chunks; 'fmt ' (PCM tag 1) + 'data'.
"""

from __future__ import annotations

import struct


class MediaFormatError(ValueError):
    pass


# --- BMP --------------------------------------------------------------------


def decode_bmp(blob: bytes) -> tuple[int, int, int, bytes]:
    """-> (width, height, channels=3, RGB bytes row-major top-down)."""
    if len(blob) < 54 or blob[:2] != b"BM":
        raise MediaFormatError("not a BMP")
    data_off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size = struct.unpack_from("<I", blob, 14)[0]
    if hdr_size < 40:
        raise MediaFormatError("unsupported BMP header")
    width, height = struct.unpack_from("<ii", blob, 18)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if planes != 1 or compression != 0 or bpp not in (24, 32):
        raise MediaFormatError(f"unsupported BMP: bpp={bpp} comp={compression}")
    top_down = height < 0
    height = abs(height)
    nch = bpp // 8
    row_stride = (width * nch + 3) & ~3
    need = data_off + row_stride * height
    if len(blob) < need:
        raise MediaFormatError("truncated BMP")
    out = bytearray(width * height * 3)
    for row in range(height):
        src_row = row if top_down else height - 1 - row
        base = data_off + src_row * row_stride
        dst = row * width * 3
        for col in range(width):
            p = base + col * nch
            # BGR(A) -> RGB
            out[dst] = blob[p + 2]
            out[dst + 1] = blob[p + 1]
            out[dst + 2] = blob[p]
            dst += 3
    return width, height, 3, bytes(out)


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """24-bit bottom-up BI_RGB BMP from top-down RGB bytes."""
    if len(rgb) != width * height * 3:
        raise MediaFormatError("rgb size mismatch")
    row_stride = (width * 3 + 3) & ~3
    img_size = row_stride * height
    out = bytearray(54 + img_size)
    struct.pack_into("<2sIHHI", out, 0, b"BM", 54 + img_size, 0, 0, 54)
    struct.pack_into(
        "<IiiHHIIiiII", out, 14, 40, width, height, 1, 24, 0, img_size,
        2835, 2835, 0, 0,
    )
    for row in range(height):
        src = (height - 1 - row) * width * 3  # bottom-up
        base = 54 + row * row_stride
        for col in range(width):
            s = src + col * 3
            p = base + col * 3
            out[p] = rgb[s + 2]
            out[p + 1] = rgb[s + 1]
            out[p + 2] = rgb[s]
    return bytes(out)


# --- PPM --------------------------------------------------------------------


def _ppm_tokens(blob: bytes, n: int, pos: int) -> tuple[list[bytes], int]:
    toks: list[bytes] = []
    ln = len(blob)
    while len(toks) < n:
        while pos < ln and blob[pos : pos + 1].isspace():
            pos += 1
        if pos < ln and blob[pos : pos + 1] == b"#":
            while pos < ln and blob[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < ln and not blob[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise MediaFormatError("truncated PPM header")
        toks.append(blob[start:pos])
    return toks, pos


def decode_ppm(blob: bytes) -> tuple[int, int, int, bytes]:
    """-> (width, height, channels=3, RGB bytes)."""
    if blob[:2] not in (b"P6", b"P3"):
        raise MediaFormatError("not a PPM")
    binary = blob[:2] == b"P6"
    toks, pos = _ppm_tokens(blob, 3, 2)
    width, height, maxval = (int(t) for t in toks)
    if maxval <= 0 or maxval > 255:
        raise MediaFormatError(f"unsupported PPM maxval {maxval}")
    n = width * height * 3
    if binary:
        pos += 1  # single whitespace after maxval
        pix = blob[pos : pos + n]
        if len(pix) < n:
            raise MediaFormatError("truncated PPM")
    else:
        toks, _ = _ppm_tokens(blob, n, pos)
        pix = bytes(int(t) for t in toks)
    if maxval != 255:
        pix = bytes((v * 255) // maxval for v in pix)
    return width, height, 3, pix


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    if len(rgb) != width * height * 3:
        raise MediaFormatError("rgb size mismatch")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


# --- WAV --------------------------------------------------------------------


def decode_wav(blob: bytes) -> tuple[int, int, int, bytes]:
    """-> (sample_rate, channels, bits_per_sample, raw PCM frames)."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise MediaFormatError("not a WAV")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise MediaFormatError("WAV missing fmt/data chunk")
    tag, channels, rate, _brate, _align, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag != 1 or bits not in (8, 16):
        raise MediaFormatError(f"unsupported WAV: tag={tag} bits={bits}")
    return rate, channels, bits, data


def encode_wav(rate: int, channels: int, bits: int, pcm: bytes) -> bytes:
    align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * align, align, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    if len(pcm) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# --- sniffing ---------------------------------------------------------------


def sniff(blob: bytes) -> str | None:
    """'bmp' | 'ppm' | 'wav' | None for formats needing external codecs."""
    if blob[:2] == b"BM":
        return "bmp"
    if blob[:2] in (b"P6", b"P3"):
        return "ppm"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav"
    return None
