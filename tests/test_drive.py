"""Drive ingestion utilities with an injected fetcher (no network)."""

from __future__ import annotations

import json

from lion_parcel_etl_spark.sources.drive import (
    DriveItem,
    download_all,
    folder_id_from_url,
    list_folder,
    list_json_files,
    read_json_file,
)

FOLDER_HTML = """
<html><body>
<a class="flip-entry" data-id="abc123" href="#">
  <div class="flip-entry-title">result-json-0.json</div></a>
<a class="flip-entry" data-id="def456" href="#">
  <div class="flip-entry-title">notes.txt</div></a>
</body></html>
"""

IVD_HTML = (
    "<html><script>window['_DRIVE_ivd'] = '"
    '[[\\"11112222333344445555aaaa\\",null,\\"a.json\\",\\"application/json\\"],'
    '[\\"11112222333344445555aaaa\\",null,\\"a.json\\",\\"application/json\\"],'
    '[\\"99998888777766665555bbbb\\",null,\\"b.json\\",\\"application/json\\"]]'
    "';</script></html>"
)


def test_folder_id_from_url_variants():
    assert folder_id_from_url("https://drive.google.com/drive/folders/XYZ?usp=x") == "XYZ"
    assert folder_id_from_url("https://drive.google.com/open?id=ABC") == "ABC"
    assert folder_id_from_url("rawid123") == "rawid123"


def test_list_folder_anchor_parse():
    items = list_folder("https://x/folders/F", fetch=lambda url: FOLDER_HTML.encode())
    assert [(i.id, i.name) for i in items] == [
        ("abc123", "result-json-0.json"),
        ("def456", "notes.txt"),
    ]
    assert "abc123" in items[0].download_link


def test_list_folder_ivd_fallback_dedupes():
    items = list_folder("F", fetch=lambda url: IVD_HTML.encode())
    assert [(i.name, i.mime_type) for i in items] == [
        ("a.json", "application/json"),
        ("b.json", "application/json"),
    ]


def test_download_all_filters_and_writes(tmp_path):
    payloads = {"j1.json": b'{"x": 1}', "skip.txt": b"no"}
    items = [DriveItem(id=n, name=n) for n in payloads]

    def fetch(url):
        fid = url.rsplit("id=", 1)[1]
        return payloads[fid]

    written = download_all(items, tmp_path, fetch=fetch)
    assert [p.name for p in written] == ["j1.json"]
    assert list_json_files(tmp_path) == written
    assert read_json_file(written[0]) == {"x": 1}


def test_reference_fixture_glob_roundtrip():
    files = list_json_files("/root/reference/downloads_json")
    assert len(files) == 8
    doc = read_json_file(files[0])
    assert "MetricDataResults" in doc


def test_download_fans_out(tmp_path):
    names = [f"f{i}.json" for i in range(20)]
    items = [DriveItem(id=n, name=n) for n in names]
    seen = []

    def fetch(url):
        seen.append(url)
        return json.dumps({"n": url}).encode()

    written = download_all(items, tmp_path, fetch=fetch, max_workers=4)
    assert len(written) == 20 and len(seen) == 20


def test_download_folder_one_call_end_to_end(tmp_path):
    """S10: the gdown-style one-call path — folder URL in, local files
    out — listing and fetching through the same injectable fetch."""
    from lion_parcel_etl_spark.sources.drive import download_folder

    listing = (
        '<a data-id="abcdefghij1234567890x">'
        '<div class="flip-entry-title">a.json</div></a>'
        '<a data-id="abcdefghij1234567890y">'
        '<div class="flip-entry-title">b.csv</div></a>'
    )
    payloads = {
        "abcdefghij1234567890x": b'{"a": 1}',
        "abcdefghij1234567890y": b"b,c\n1,2\n",
    }

    def fetch(url):
        if "embeddedfolderview" in url:
            return listing.encode()
        return payloads[url.rsplit("id=", 1)[1]]

    url = "https://drive.google.com/drive/folders/FOLDER123?usp=sharing"
    written = download_folder(url, tmp_path, fetch=fetch)
    assert sorted(p.name for p in written) == ["a.json", "b.csv"]
    assert (tmp_path / "a.json").read_bytes() == b'{"a": 1}'
    only_json = download_folder(url, tmp_path / "j", fetch=fetch, suffix=".json")
    assert [p.name for p in only_json] == ["a.json"]
