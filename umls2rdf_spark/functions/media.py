"""Format dispatch for the stdlib image codecs: sniff the magic
bytes and route to the PNG (functions/png.py) or baseline JPEG
(functions/jpeg.py) decoder. The multimodal operators call this so a
mixed PNG/JPEG corpus — the realistic web-crawl shape — hashes and
resizes without PIL; anything else keeps the explicit
``NotImplementedError`` contract.

No Spark imports; register_pickle_by_value'd by callers together
with the two codec modules (operators/pq.py pattern)."""

from __future__ import annotations

from umls2rdf_spark.functions import jpeg as _jpeg
from umls2rdf_spark.functions import png as _png

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_image_gray(b: bytes):
    """Image bytes (PNG or baseline JPEG) → (h, w) uint8 grayscale
    ndarray."""
    if b[:8] == PNG_MAGIC:
        return _png.decode_png_gray(b)
    if len(b) >= 2 and b[0] == 0xFF and b[1] == 0xD8:
        return _jpeg.decode_jpeg_gray(b)
    raise NotImplementedError(
        "stdlib codecs support PNG and baseline JPEG bytes only "
        "(install PIL or inject image_module for other formats)"
    )
