"""Pure-stdlib PNG codec shared by the multimodal operators
(resize_images, image_ahash): zlib inflate, filter 0-4 de-filtering,
filter-0 deflate re-encode. 8-bit grayscale/RGB only — anything else
raises ``NotImplementedError`` with a clear message (the callers'
contract: never silently fake a decode).

Worker shipping: this module holds no Spark imports and is
register_pickle_by_value'd by its callers around their
mapInPandas calls, so executor pythons need neither PIL nor the repo
on sys.path (the same pattern as operators/pq.py).
"""

from __future__ import annotations

_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png(b: bytes):
    """PNG bytes → (width, height, channels, raw_pixels): channels 1
    (grayscale) or 3 (RGB), raw row-major with filters undone."""
    import struct
    import zlib

    if b[:8] != _MAGIC:
        raise NotImplementedError(
            "stdlib codec supports PNG bytes only (install PIL or "
            "inject image_module for other formats)"
        )
    pos, idat = 8, b""
    w = h = bitd = colt = None
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos:pos + 4])
        typ = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + length]
        if typ == b"IHDR":
            w, h, bitd, colt = struct.unpack(">IIBB", data[:10])
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + length
    if w is None or bitd != 8 or colt not in (0, 2):
        raise NotImplementedError(
            "stdlib codec supports 8-bit grayscale/RGB PNG only "
            f"(got bit depth {bitd}, color type {colt})"
        )
    ch = 1 if colt == 0 else 3
    raw = zlib.decompress(idat)
    stride = w * ch
    out = bytearray()
    prev = bytearray(stride)
    p = 0
    for _ in range(h):
        f = raw[p]
        p += 1
        line = bytearray(raw[p:p + stride])
        p += stride
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                up = prev[i]
                c = prev[i - ch] if i >= ch else 0
                pa = abs(up - c)
                pb = abs(a - c)
                pc = abs(a + up - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif f != 0:
            raise NotImplementedError(f"PNG filter type {f}")
        out += line
        prev = line
    return w, h, ch, bytes(out)


def encode_png(w: int, h: int, ch: int, raw: bytes) -> bytes:
    """(width, height, channels, raw_pixels) → filter-0 PNG bytes."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0 if ch == 1 else 2, 0, 0, 0)
    stride = w * ch
    body = b"".join(
        b"\x00" + raw[r * stride:(r + 1) * stride] for r in range(h)
    )
    return (
        _MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(body))
        + chunk(b"IEND", b"")
    )


def decode_png_gray(b: bytes):
    """PNG bytes → (h, w) uint8 grayscale ndarray via integer luma
    (r*299 + g*587 + b*114) // 1000."""
    import numpy as np

    w, h, ch, raw = decode_png(b)
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, ch)
    if ch == 3:
        a64 = arr.astype(np.int64)
        gray = (
            a64[:, :, 0] * 299 + a64[:, :, 1] * 587 + a64[:, :, 2] * 114
        ) // 1000
        return gray.astype(np.uint8)
    return arr[:, :, 0]
