"""UMLS release acquisition + staging — counterpart of the
reference's download_umls.py (download_umls.py:1-39: fetch the
release zip via umls_downloader, extract to UMLS_EXTRACT_DIR).

This container has no network and no umls_downloader, so the fetch
step accepts a local path or file:// URL directly and gates real HTTP
behind urllib (works unchanged in a networked deployment); the
staging step — extract, locate the RRF files wherever the release
nests them, optional integrity check — is fully implemented and
tested offline. ``stage_release() -> rrf_dir`` feeds straight into
``pipeline.load_umls_tables``.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import zipfile
from urllib.parse import urlparse

RRF_TABLES = "MRCONSO MRREL MRDEF MRSAT MRSTY MRRANK MRSAB MRDOC".split()


def fetch_release(source: str, dest_dir: str) -> str:
    """Obtain the release zip: local path / file:// URL are copied,
    http(s) URLs stream via urllib (the reference delegates this to
    umls_downloader with an API key; deployments with UTS auth can
    pass the authenticated URL). Returns the local zip path."""
    os.makedirs(dest_dir, exist_ok=True)
    parsed = urlparse(source)
    name = os.path.basename(parsed.path or source) or "umls-release.zip"
    dest = os.path.join(dest_dir, name)
    if parsed.scheme in ("", "file"):
        src = parsed.path if parsed.scheme == "file" else source
        if os.path.abspath(src) != os.path.abspath(dest):
            shutil.copyfile(src, dest)
        else:
            dest = src
    elif parsed.scheme in ("http", "https"):
        import urllib.request

        with urllib.request.urlopen(source) as resp, open(dest, "wb") as out:
            shutil.copyfileobj(resp, out)
    else:
        raise ValueError(f"unsupported release source: {source!r}")
    return dest


def verify_md5(path: str, expected_md5: str) -> None:
    """Integrity gate (the NLM release page publishes MD5s; the
    reference trusts the downloader). Streams in 1 MiB chunks."""
    h = hashlib.md5()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    got = h.hexdigest()
    if got != expected_md5.lower():
        raise ValueError(
            f"release md5 mismatch for {path}: expected {expected_md5}, "
            f"got {got}"
        )


def find_rrf_dir(root: str) -> str:
    """Locate the directory holding the .RRF files — UMLS releases
    nest them under <version>/META/. Picks the directory containing
    MRCONSO.RRF; raises if none or several."""
    hits = []
    for dirpath, _dirs, files in os.walk(root):
        if "MRCONSO.RRF" in files:
            hits.append(dirpath)
    if not hits:
        raise FileNotFoundError(f"no MRCONSO.RRF under {root}")
    if len(hits) > 1:
        raise ValueError(f"multiple META dirs under {root}: {hits}")
    return hits[0]


def stage_release(
    source: str,
    work_dir: str,
    expected_md5: str | None = None,
) -> str:
    """fetch → (verify) → extract → locate META: returns the RRF dir
    ready for ``load_umls_tables``. Mirrors download_umls.py's
    main(): zip extracted under <work_dir>/extracted (the reference's
    UMLS_EXTRACT_DIR default, download_umls.py:10-14)."""
    zip_path = fetch_release(source, work_dir)
    if expected_md5:
        verify_md5(zip_path, expected_md5)
    extract_dir = os.path.join(work_dir, "extracted")
    os.makedirs(extract_dir, exist_ok=True)
    with zipfile.ZipFile(zip_path) as zf:
        for member in zf.namelist():
            # zip-slip guard: entries must stay inside extract_dir
            target = os.path.realpath(os.path.join(extract_dir, member))
            if not target.startswith(os.path.realpath(extract_dir) + os.sep):
                raise ValueError(f"unsafe zip entry: {member!r}")
        zf.extractall(extract_dir)
    return find_rrf_dir(extract_dir)
