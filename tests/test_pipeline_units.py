"""Pure-Python units for the pipeline fixtures and helpers (no Spark
session — these pin the formulas both engines share)."""

from __future__ import annotations

import json

import pytest

from graven_spark.oracle import details_json
from graven_spark.plans.pipeline import (
    fixture_cwe_html_py,
    fixture_nvd_py,
    fixture_report_py,
    jar_table_py,
    nvd_miss_py,
)
from graven_spark.streaming.pipeline import _window_seconds


def test_fixture_report_shapes():
    seen_counts = set()
    for i in range(200):
        rep = json.loads(fixture_report_py(f"art-{i}.0.jar"))
        ids = [m["vulnerability"]["id"] for m in rep["matches"]]
        cves = [v for v in ids if v.startswith("CVE-2024-")]
        seen_counts.add(len(cves))
        assert all(v.startswith(("CVE-", "GHSA-")) for v in ids)
        assert rep["descriptor"]["timestamp"] == "2024-03-01T00:00:00Z"
    assert seen_counts == {0, 1, 2}  # h%3 match counts all occur


def test_fixture_nvd_parses_and_misses():
    hits = misses = 0
    for i in range(100):
        cid = f"CVE-2024-{i:04d}"
        if nvd_miss_py(cid):
            misses += 1
            continue
        hits += 1
        c = json.loads(fixture_nvd_py(cid))["vulnerabilities"][0]["cve"]
        assert c["id"] == cid
        langs = [d["lang"] for d in c["descriptions"]]
        assert langs == ["fr", "en"]  # parser must pick the en one
        score = c["metrics"]["cvssMetricV31"][0]["cvssData"]["baseScore"]
        assert 1.0 <= score <= 9.9
        weak = [d["value"] for w in c["weaknesses"] for d in w["description"]]
        assert any(v.startswith("CWE-") for v in weak)
    assert hits and misses  # both branches occur


def test_fixture_cwe_html_round_trips():
    html = fixture_cwe_html_py("CWE-79")
    assert "<h2>CWE-79: Synth Weakness 79</h2>" in html
    assert '<div id="Description">' in html


def test_jar_table_py_dedup_and_gav():
    import datetime as dt

    t0, t1 = dt.datetime(2025, 1, 1), dt.datetime(2025, 1, 2)
    rows = jar_table_py([
        ("https://a.example.com/maven2/g/sub/art/1.0/art-1.0.jar", t1),
        ("https://b.example.com/maven2/g/sub/art/1.0/art-1.0.jar", t0),  # same uri
        ("https://a.example.com/maven2/short.jar", t0),
    ])
    by_id = {r["jar_id"]: r for r in rows}
    assert by_id["art-1.0.jar"]["group_id"] == "g.sub"
    assert by_id["art-1.0.jar"]["artifact_id"] == "art"
    assert by_id["art-1.0.jar"]["version"] == "1.0"
    assert by_id["art-1.0.jar"]["publish_date"] == t0  # (uri, ts) min wins
    assert by_id["short.jar"]["group_id"] is None  # too short for GAV


def test_details_json_matches_to_json_semantics():
    assert details_json(attempt=1, parent_url=None, depth=0) == '{"attempt":1,"depth":0}'
    assert details_json(parent_url="u", depth=2) == '{"parent_url":"u","depth":2}'


def test_window_seconds():
    assert _window_seconds(90) == 90
    assert _window_seconds("1 hour") == 3600
    assert _window_seconds("15 minutes") == 900
    with pytest.raises(KeyError):
        _window_seconds("3 fortnights")
