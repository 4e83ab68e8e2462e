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
import urllib.error
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


class DriveQuotaError(Exception):
    """Drive's per-file quota / permission refusal: the 'Quota
    exceeded' HTML interstitial (served 200 — one attempt, never
    retried), or an HTTP 403 that persisted through the bounded retry
    budget (403 is ambiguous between hard quota and a transient
    rate-limit burst, so it gets the budget before being classified).
    ``on_error="skip"`` records and skips the file instead of failing
    the batch."""


_CONFIRM_TOKEN = re.compile(r"confirm=([0-9A-Za-z_-]+)")
_QUOTA_MARKERS = (b"Quota exceeded", b"Too many users have viewed or downloaded")


def _fetch_file(it: DriveItem, fetch: Callable[[str], bytes]) -> bytes:
    """One file fetch with the two Drive-specific response shapes
    handled: the large-file virus-scan interstitial (an HTML page with
    a ``confirm=`` token — follow it with ONE extra fetch, the
    documented public-Drive redirect dance) and the quota-exceeded
    interstitial (served 200 with an HTML body → DriveQuotaError, so a
    poisoned HTML page is never written where a data file belongs)."""
    data = fetch(it.download_link)
    if data.lstrip()[:15].lower().startswith((b"<!doctype html", b"<html")):
        if any(m in data for m in _QUOTA_MARKERS):
            raise DriveQuotaError(it.name)
        tok = _CONFIRM_TOKEN.search(data.decode("utf-8", errors="replace"))
        if tok:
            data = fetch(it.download_link + "&confirm=" + tok.group(1))
            if data.lstrip()[:15].lower().startswith((b"<!doctype html", b"<html")):
                # Same three-way split as the first response: only a
                # quota MARKER is a hard refusal; any other HTML behind
                # the confirm hop (a transient splash, a sign-in page)
                # is the retryable unrecognized-interstitial case — it
                # must not be mislabeled as quota, which is never
                # retried.
                if any(m in data for m in _QUOTA_MARKERS):
                    raise DriveQuotaError(it.name)
                raise ValueError(
                    f"{it.name}: unrecognized HTML interstitial after confirm hop"
                )
        else:
            # HTML with neither a quota marker nor a confirm token —
            # a sign-in page, a changed interstitial, a proxy splash.
            # NEVER write it where a data file belongs; surface it as
            # a (retryable, then recorded) failure instead.
            raise ValueError(
                f"{it.name}: unrecognized HTML interstitial instead of file body"
            )
    return data


def download_all(
    items: list[DriveItem],
    dest_dir: str | Path,
    fetch: Callable[[str], bytes] = default_fetch,
    max_workers: int = 6,
    suffix: str = ".json",
    retries: int = 2,
    on_error: str = "raise",
    failures: list[tuple[DriveItem, Exception]] | None = None,
) -> list[Path]:
    """Download ``items`` whose name ends with ``suffix`` into
    ``dest_dir`` with a bounded thread pool; returns the written paths.

    Failure modes (pinned in tests/test_drive.py):

    - TRANSIENT errors (socket timeouts, URLError, truncated bodies
      surfacing as IncompleteRead/ConnectionError) retry up to
      ``retries`` extra attempts per file, then count as failed.
    - The quota INTERSTITIAL (an HTML body with a quota marker) is
      non-transient: one attempt, classified :class:`DriveQuotaError`.
      An HTTP 403 is ambiguous (hard quota vs transient rate-limit
      burst): it retries within the same budget and is classified
      DriveQuotaError only once the budget is spent.
    - ``on_error="raise"`` (default): the all-or-nothing staging load.
      Every download is STAGED to a hidden ``.<name>.part`` temp file
      in ``dest_dir`` and renamed to its final name only after every
      item has succeeded, so a failed run never leaves a partial
      landing set — and, critically, never deletes files that already
      existed in ``dest_dir`` from a prior successful run (a failed
      re-run over a complete landing directory leaves it untouched).
      On failure the temp files are removed and the first failure (in
      item order) re-raises. ``on_error="skip"``: each successful
      item is renamed into place individually; failed files are
      skipped; each (item, exception) is appended to ``failures`` if
      the caller passed a list, so a nightly ingest can land 999 files
      and re-queue 1.
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    dest = Path(dest_dir)
    dest.mkdir(parents=True, exist_ok=True)
    todo = [it for it in items if it.name.lower().endswith(suffix)]

    def one(it: DriveItem) -> tuple[Path | None, Exception | None]:
        attempt = 0
        while True:
            try:
                data = _fetch_file(it, fetch)
                break
            except DriveQuotaError as exc:
                err: Exception = exc
            except urllib.error.HTTPError as exc:
                if exc.code == 403:
                    # Drive serves 403 for BOTH hard quota refusals and
                    # transient userRateLimitExceeded bursts — retry
                    # within the same bounded budget, and classify as
                    # quota only once the budget is spent (so a burst
                    # that clears on retry succeeds, and a true quota
                    # failure is still labeled for re-queueing).
                    if attempt < retries:
                        attempt += 1
                        continue
                    err = DriveQuotaError(f"{it.name}: HTTP 403")
                else:  # 5xx / 429 etc: transient, retry within budget
                    err = exc
                    if attempt < retries:
                        attempt += 1
                        continue
            except Exception as exc:  # transient: retry within budget
                err = exc
                if attempt < retries:
                    attempt += 1
                    continue
            return None, err
        # Stage to a hidden temp name in dest (same filesystem, so the
        # later rename is atomic) — the final name only ever appears
        # once the whole call has decided it is keeping this file.
        tmp = dest / f".{it.name}.part"
        with open(tmp, "wb") as f:
            for i in range(0, len(data), CHUNK):
                f.write(data[i : i + CHUNK])
        return tmp, None

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        results = list(pool.map(one, todo))
    staged = [(it, p) for it, (p, _) in zip(todo, results) if p is not None]
    errs = [(it, e) for it, (_, e) in zip(todo, results) if e is not None]
    if errs:
        if on_error == "raise":
            # All-or-nothing: drop the staged temp files and re-raise.
            # Files that pre-existed in dest (e.g. from a prior
            # successful run) were never touched — a failed re-run
            # over a complete landing directory leaves it complete.
            for _, p in staged:
                p.unlink(missing_ok=True)
            raise errs[0][1]
        if failures is not None:
            failures.extend(errs)
    written = []
    for it, tmp in staged:
        final = dest / it.name
        tmp.replace(final)  # atomic within dest; overwrites stale copy
        written.append(final)
    return written


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
