"""URL detection + content-type sniffing — the OFFLINE half of the
reference's URL processor (S13/M20).

The reference fetches URLs at extraction time (url_processor.py:29-225).
This engine's corpus is pre-fetched (no network in the batch path), but
the ROUTING logic is pure and reusable: ``is_url`` mirrors
url_processor.py:291-304 and ``detect_format`` mirrors the
extension-map + content-type-map dispatch of ``_detect_file_from_url``
(url_processor.py:64-167) without the HEAD request — the caller supplies
the content type it already knows (from a crawl record, a WARC header,
an object-store metadata field). The result's ``file_type`` feeds the
same extension dispatch as real file bytes
(binary_formats.file_bytes_to_input_spans)."""

from __future__ import annotations

from urllib.parse import urlparse

# extension -> file_type (url_processor.py:81-101, verbatim set)
EXTENSION_TYPES = {
    ".pdf": "pdf",
    ".doc": "doc",
    ".docx": "docx",
    ".txt": "txt",
    ".md": "markdown",
    ".html": "html",
    ".htm": "html",
    ".xlsx": "xlsx",
    ".xls": "xls",
    ".csv": "csv",
    ".ppt": "ppt",
    ".pptx": "pptx",
    ".jpg": "image",
    ".jpeg": "image",
    ".png": "image",
    ".gif": "image",
    ".bmp": "image",
    ".tiff": "image",
    ".tif": "image",
    ".webp": "image",
}

# content-type fragment -> (file_type, extension)
# (url_processor.py:123-158 branch ladder, flattened)
_CONTENT_TYPES = (
    ("application/pdf", ("pdf", ".pdf")),
    (
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
        ("docx", ".docx"),
    ),
    ("application/msword", ("doc", ".doc")),
    (
        "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
        ("xlsx", ".xlsx"),
    ),
    ("application/vnd.ms-excel", ("xls", ".xls")),
    (
        "application/vnd.openxmlformats-officedocument.presentationml.presentation",
        ("pptx", ".pptx"),
    ),
    ("application/vnd.ms-powerpoint", ("ppt", ".ppt")),
    ("text/markdown", ("markdown", ".md")),
    ("text/plain", ("txt", ".txt")),
    ("image/jpeg", ("image", ".jpg")),
    ("image/png", ("image", ".png")),
    ("image/gif", ("image", ".gif")),
    ("image/bmp", ("image", ".bmp")),
    ("image/tiff", ("image", ".tiff")),
    ("image/webp", ("image", ".webp")),
)


def is_url(text: str) -> bool:
    """True when ``text`` parses with both a scheme and a netloc
    (url_processor.py:291-304 — M20)."""
    try:
        result = urlparse(text)
        return bool(result.scheme) and bool(result.netloc)
    except (ValueError, AttributeError):
        return False


def detect_format(
    url: str,
    content_type: str | None = None,
    content_disposition: str | None = None,
) -> dict | None:
    """Routing decision for a URL: ``{'file_type', 'extension',
    'filename'}`` when it points at a file, ``None`` when it should be
    treated as a web page (url_processor.py:64-167 semantics; the
    caller supplies headers it already has instead of a HEAD fetch).
    ``text/html`` counts as a file only with an attachment disposition
    (url_processor.py:141-146)."""
    import os

    path = urlparse(url).path.lower()
    for ext, file_type in EXTENSION_TYPES.items():
        if path.endswith(ext):
            return {
                "file_type": file_type,
                "extension": ext,
                "filename": os.path.basename(path) or f"downloaded_file{ext}",
            }
    if content_type:
        ct = content_type.lower()
        if "text/html" in ct:
            if "attachment" in (content_disposition or "").lower():
                return {
                    "file_type": "html",
                    "extension": ".html",
                    "filename": "downloaded_file.html",
                }
            return None  # web page
        for fragment, (file_type, ext) in _CONTENT_TYPES:
            if fragment in ct:
                return {
                    "file_type": file_type,
                    "extension": ext,
                    "filename": f"downloaded_file{ext}",
                }
    return None
