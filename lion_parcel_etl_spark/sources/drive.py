"""Driver-side Google-Drive-folder ingestion utilities (S4-S7).

Re-expresses (not ports) the reference's public-folder scraper at
``public/lion_parcell_bonus_test_stg.py:29-146`` and the vestigial
``drive.py`` module (``public/__pycache__/drive.cpython-310.pyc``):

- ``folder_id_from_url`` — S6: path segment after ``/folders/``, else
  the ``id`` query parameter.
- ``list_folder`` — S4: fetch the ``embeddedfolderview`` listing and
  parse item anchors; S5: fall back to the inline JS data blob
  (``_DRIVE_ivd``), unicode-escape-decoded, deduped by (id, name).
- ``download_all`` — S7: bounded thread pool streaming each file to a
  local directory in chunks.
- ``list_json_files`` / ``read_json_file`` — the vestigial module's
  local-glob path.

Everything network-shaped takes an injectable ``fetch`` callable
(``url -> bytes``) so tests (and air-gapped environments) substitute
local fixtures; nothing here touches Spark — ingestion lands files,
``sources.metrics_json`` turns them into DataFrames. At real scale the
listing stays driver-side (one small HTTP call) and the download fans
out to ``sc.parallelize(urls).foreachPartition`` instead of a local
thread pool; the interface is the same either way.
"""

from __future__ import annotations

import json
import re
import urllib.parse
import urllib.request
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from pathlib import Path

EMBEDDED_VIEW = "https://drive.google.com/embeddedfolderview?id={fid}#list"
FILE_DOWNLOAD = "https://drive.google.com/uc?export=download&id={fid}"
CHUNK = 8192


@dataclass
class DriveItem:
    id: str
    name: str
    mime_type: str | None = None

    @property
    def web_view_link(self) -> str:
        return f"https://drive.google.com/file/d/{self.id}/view"

    @property
    def download_link(self) -> str:
        return FILE_DOWNLOAD.format(fid=self.id)


def default_fetch(url: str, timeout: int = 30) -> bytes:
    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        return resp.read()


def folder_id_from_url(url: str) -> str:
    """Folder id from a Drive URL: `/folders/<id>` path segment, else
    the `id` query parameter, else the string as-is (already an id)."""
    if "/folders/" in url:
        tail = url.split("/folders/", 1)[1]
        return re.split(r"[?#/]", tail, 1)[0]
    q = urllib.parse.parse_qs(urllib.parse.urlparse(url).query)
    if "id" in q and q["id"]:
        return q["id"][0]
    return url


_ANCHOR = re.compile(
    r'<a[^>]*\bdata-id="(?P<id>[^"]+)"[^>]*>(?P<body>.*?)</a>', re.DOTALL
)
_NAME_IN_BODY = re.compile(r'class="[^"]*flip-entry-title[^"]*"[^>]*>([^<]+)<')
_IVD_BLOB = re.compile(r"window\[['\"]_DRIVE_ivd['\"]\]\s*=\s*'((?:[^'\\]|\\.)*)'")
_IVD_ITEM = re.compile(
    r'\["(?P<id>[-\w]{20,})"[^\]]*?,"(?P<name>[^"]+)","(?P<mime>[\w.-]+/[\w.+-]+)"'
)


def _parse_anchors(html: str) -> list[DriveItem]:
    items = []
    for m in _ANCHOR.finditer(html):
        name_m = _NAME_IN_BODY.search(m.group("body"))
        name = (name_m.group(1) if name_m else "").strip()
        if name:
            items.append(DriveItem(id=m.group("id"), name=name))
    return items


def _parse_ivd(html: str) -> list[DriveItem]:
    blob_m = _IVD_BLOB.search(html)
    if not blob_m:
        return []
    blob = blob_m.group(1).encode().decode("unicode_escape")
    seen: set[tuple[str, str]] = set()
    items = []
    for m in _IVD_ITEM.finditer(blob):
        key = (m.group("id"), m.group("name"))
        if key in seen:
            continue
        seen.add(key)
        items.append(DriveItem(id=m.group("id"), name=m.group("name"), mime_type=m.group("mime")))
    return items


def list_folder(
    folder_url: str, fetch: Callable[[str], bytes] = default_fetch
) -> list[DriveItem]:
    """List a public Drive folder: anchor parse first, JS-blob fallback."""
    fid = folder_id_from_url(folder_url)
    html = fetch(EMBEDDED_VIEW.format(fid=fid)).decode("utf-8", errors="replace")
    return _parse_anchors(html) or _parse_ivd(html)


def download_all(
    items: list[DriveItem],
    dest_dir: str | Path,
    fetch: Callable[[str], bytes] = default_fetch,
    max_workers: int = 6,
    suffix: str = ".json",
) -> list[Path]:
    """Download ``items`` whose name ends with ``suffix`` into
    ``dest_dir`` with a bounded thread pool; returns the written paths."""
    dest = Path(dest_dir)
    dest.mkdir(parents=True, exist_ok=True)
    todo = [it for it in items if it.name.lower().endswith(suffix)]

    def one(it: DriveItem) -> Path:
        data = fetch(it.download_link)
        path = dest / it.name
        with open(path, "wb") as f:
            for i in range(0, len(data), CHUNK):
                f.write(data[i : i + CHUNK])
        return path

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return list(pool.map(one, todo))


def download_folder(
    folder_url: str,
    dest_dir: str | Path,
    fetch: Callable[[str], bytes] = default_fetch,
    max_workers: int = 6,
    suffix: str = "",
) -> list[Path]:
    """One-call public-folder download (S10): list the folder, then
    fetch every file whose name ends with ``suffix`` (default: all) —
    the engine's analog of the reference's vestigial gdown
    ``download_folder`` path (``public/__pycache__/drive.cpython-310.pyc``),
    built on the same injectable-fetch listing/download machinery as
    the staging scraper rather than a third-party client."""
    return download_all(
        list_folder(folder_url, fetch), dest_dir, fetch, max_workers, suffix
    )


def list_json_files(directory: str | Path) -> list[Path]:
    return sorted(Path(directory).glob("*.json"))


def read_json_file(path: str | Path) -> dict:
    with open(path, encoding="utf-8") as f:
        return json.load(f)
