"""Shared fixtures: one local SparkSession per test session, synthetic
graphs, and oracle-input converters."""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graven_spark.session import build_session  # noqa: E402
from graven_spark.sources import synth  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(master="local[4]", shuffle_partitions=8,
                      extra_conf={"spark.driver.memory": "4g"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def smoke_graph() -> synth.SiteGraph:
    return synth.generate_graph(synth.smoke_specs(), host_budget=5)


@pytest.fixture(scope="session")
def t2_graph() -> synth.SiteGraph:
    return synth.generate_graph(synth.correctness_specs(), host_budget=200)


def pages_dict(pages: pd.DataFrame) -> dict[str, dict]:
    return {
        r.url: {"html": r.html, "warc_ts": r.warc_ts.to_pydatetime(), "lang": r.lang}
        for r in pages.itertuples()
    }


def robots_dict(robots: pd.DataFrame) -> dict[str, dict]:
    return {
        r.host: {
            "disallow_prefixes": list(r.disallow_prefixes),
            "crawl_delay_tokens": int(r.crawl_delay_tokens),
        }
        for r in robots.itertuples()
    }


@pytest.fixture(scope="session")
def testdata_dir() -> str:
    return "/root/testdata/sf0.001"
