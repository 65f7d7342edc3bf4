"""WARC segment ingestion: pure-parser semantics, streaming equivalence,
the Spark reader, and the ingest CLI feeding a crawl."""

from __future__ import annotations

import io
import os

import pytest

from graven_spark.sources import warc


def _fixture_records() -> list[bytes]:
    b1 = b'<html><a href="sub/">sub/</a></html>'
    b2 = b"<html>big</html>" * 500
    return [
        warc.build_warc_record("warcinfo", b"software: fixture\r\n"),
        warc.build_warc_record(
            "response", warc.http_response_block(b1),
            uri="https://a.example/idx", date="2024-01-02T03:04:05Z",
        ),
        warc.build_warc_record(
            "request", b"GET /idx HTTP/1.1\r\n\r\n", uri="https://a.example/idx",
        ),
        warc.build_warc_record(
            "response",
            warc.http_response_block(b2, 200, "text/html; charset=utf-8"),
            uri="https://b.example/p", date="2024-01-02T03:04:06.500000Z",
        ),
        warc.build_warc_record(
            "response", warc.http_response_block(b"gone", 404),
            uri="https://a.example/404",
        ),
    ]


def test_parse_warc_plain_gz_identical():
    recs = _fixture_records()
    plain = warc.parse_warc(warc.build_warc(recs))
    gz = warc.parse_warc(warc.build_warc(recs, gzip_members=True))
    assert plain == gz
    assert [r["url"] for r in plain] == ["https://a.example/idx", "https://b.example/p"]
    assert plain[0]["mime"] == "text/html"
    assert plain[1]["html"] == b"<html>big</html>" * 500
    assert str(plain[0]["warc_ts"]) == "2024-01-02 03:04:05"
    # 404 excluded by status range, request/warcinfo by type
    assert all(r["http_status"] == 200 for r in plain)


def test_iter_warc_records_streaming_tiny_chunks():
    """Record parse is independent of I/O chunking (streaming buffer)."""
    data = warc.build_warc(_fixture_records(), gzip_members=True)

    class Tiny(io.BytesIO):
        def read(self, n=-1):
            return super().read(min(n, 7) if n and n > 0 else n)

    whole = list(warc.iter_warc_records(io.BytesIO(data)))
    tiny = list(warc.iter_warc_records(Tiny(data)))
    assert whole == tiny
    assert len(whole) == 5 and not any(r["parse_failed"] for r in whole)


def test_iter_warc_records_malformed_sentinels():
    good = warc.build_warc(_fixture_records())
    assert [r["reason"] for r in warc.iter_warc_records(io.BytesIO(good[:40]))] \
        == ["truncated header"]
    assert [r["reason"] for r in warc.iter_warc_records(io.BytesIO(b"NOT A WARC"))] \
        == ["bad magic"]
    bad_len = warc.build_warc_record("warcinfo", b"x" * 10).replace(
        b"Content-Length: 10", b"Content-Length: xx", 1
    )
    assert [r["reason"] for r in warc.iter_warc_records(io.BytesIO(bad_len))] \
        == ["bad content-length"]
    assert list(warc.iter_warc_records(io.BytesIO(b""))) == []


def test_pages_from_warc_matches_pure_parser(spark, tmp_path):
    recs = _fixture_records()
    p1 = tmp_path / "seg-00000.warc.gz"
    p2 = tmp_path / "seg-00001.warc"
    p1.write_bytes(warc.build_warc(recs, gzip_members=True))
    p2.write_bytes(warc.build_warc([
        warc.build_warc_record(
            "response", warc.http_response_block(b"<html>c</html>"),
            uri="https://c.example/", date="2024-02-01T00:00:00Z",
        ),
    ]))
    got = warc.pages_from_warc(spark, str(tmp_path / "seg-*")).collect()
    exp = {r["url"]: r for r in
           warc.parse_warc(p1.read_bytes()) + warc.parse_warc(p2.read_bytes())}
    assert {r.url for r in got} == set(exp)
    for r in got:
        e = exp[r.url]
        assert bytes(r.html) == e["html"]
        assert r.http_status == e["http_status"]
        assert r.mime == e["mime"]
        assert r.warc_ts == e["warc_ts"]
        assert os.path.basename(r.segment).startswith("seg-0000")


def test_pages_from_warc_row_batching(spark, tmp_path):
    """A many-record segment is emitted in bounded batches, not one frame."""
    recs = [
        warc.build_warc_record(
            "response", warc.http_response_block(f"<html>{i}</html>".encode()),
            uri=f"https://n.example/{i}",
        )
        for i in range(37)
    ]
    p = tmp_path / "many.warc"
    p.write_bytes(warc.build_warc(recs))
    got = warc.pages_from_warc(spark, [str(p)], rows_per_batch=10)
    assert got.count() == 37


def test_pages_from_warc_no_match_raises(spark, tmp_path):
    with pytest.raises(ValueError):
        warc.pages_from_warc(spark, str(tmp_path / "nope-*.warc"))


def test_cli_ingest_then_crawl(spark, tmp_path):
    """ingest writes a pages parquet the crawl command accepts: WARC is a
    drop-in bootstrap for the (url, html) contract."""
    from graven_spark.__main__ import main

    body = (
        b'<html><h1>Index of /r</h1><a href="app.jar">app.jar</a>'
        b"  2024-01-01 10:00  123</html>"
    )
    seg = tmp_path / "seg.warc.gz"
    seg.write_bytes(warc.build_warc([
        warc.build_warc_record(
            "response", warc.http_response_block(body),
            uri="https://w.example.com/r/", date="2024-01-01T00:00:00Z",
        ),
    ], gzip_members=True))
    out = str(tmp_path / "pages")
    assert main(["ingest", "--warc", str(tmp_path / "*.warc.gz"),
                 "--out", out]) == 0
    assert spark.read.parquet(out).count() == 1

    seeds = tmp_path / "seeds.csv"
    seeds.write_text("https://w.example.com/r/\n")
    state = str(tmp_path / "state")
    assert main(["crawl", "--pages", out, "--seeds", str(seeds),
                 "--state", state, "--bloom-buckets", "2",
                 "--bloom-bits", "65536"]) == 0
    assert os.path.exists(os.path.join(state, "round_000000", "_COMMIT"))
