"""Common-Crawl CDX(J) index ingestion — the second CC-native source next to
WARC segments (sources/warc.py).

A CDX(J) index line is ``<urlkey (SURT)> <timestamp (yyyyMMddHHmmss)>
<JSON>`` where the JSON carries url / mime / status / digest / length /
offset / filename (the WARC segment holding the capture). Common Crawl
publishes ~300 such ``cdx-*.gz`` shards per crawl; they are the cheap way
to seed or filter a crawl without touching the 100× larger WARC data.

Scale shape — pure Catalyst end to end, zero Python:

- ``spark.read.text`` handles the gzipped shards transparently and splits
  them across tasks per file (gzip is unsplittable, but CC sizes the shards
  for exactly one task each, same contract as WARC segments).
- The line splits with ONE ``regexp_extract`` per field group (the JSON
  payload contains spaces, so naive ``split`` on ' ' is wrong) and the JSON
  parses with ``from_json`` against an explicit schema — both JVM-side,
  whole-stage-codegen friendly; malformed lines survive as
  ``parse_failed`` rows instead of corrupting the batch.
- Seed derivation avoids any global sort: selection is a status/mime
  filter + first-capture-per-url aggregate (map-side combinable min), and
  the optional cap is a ``TakeOrderedAndProject`` top-k — never a
  single-partition window.

A pure-Python twin (:func:`parse_cdx_line`) backs the CORRECTNESS VALUES
oracle. Reference parity: the reference has no index ingestion (its input
is a live scrape loop, /root/reference/graven/worker/crawler.py:62-96).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CDX_JSON_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("mime", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("digest", T.StringType()),
    T.StructField("length", T.StringType()),
    T.StructField("offset", T.StringType()),
    T.StructField("filename", T.StringType()),
])

_LINE_RE = r"^(\S+) (\d{14}) (\{.*\})$"
_TS_FMT = "yyyyMMddHHmmss"


def read_cdx(spark, path: str) -> DataFrame:
    """CDX(J) shard(s) → typed rows: (urlkey, fetch_ts, url, mime,
    http_status, digest, warc_length, warc_offset, warc_path,
    parse_failed). Lines that do not match the 3-field shape or whose JSON
    fails to parse keep their urlkey/raw context with ``parse_failed`` =
    true (never dropped silently)."""
    lines = spark.read.text(path)
    urlkey = F.regexp_extract("value", _LINE_RE, 1)
    ts_raw = F.regexp_extract("value", _LINE_RE, 2)
    payload = F.regexp_extract("value", _LINE_RE, 3)
    j = F.from_json(payload, CDX_JSON_SCHEMA)
    shape_ok = payload != ""
    json_ok = j.isNotNull() & j["url"].isNotNull()
    # try_* forms: under ANSI (Spark 4 default) a plain cast/to_timestamp of
    # a malformed value would fail the whole job; index shards are untrusted
    # input, so bad values null out exactly like the pure twin.
    return lines.select(
        F.when(shape_ok, urlkey).alias("urlkey"),
        F.when(shape_ok, F.try_to_timestamp(ts_raw, F.lit(_TS_FMT)))
        .alias("fetch_ts"),
        j["url"].alias("url"),
        j["mime"].alias("mime"),
        j["status"].try_cast("int").alias("http_status"),
        j["digest"].alias("digest"),
        j["length"].try_cast("long").alias("warc_length"),
        j["offset"].try_cast("long").alias("warc_offset"),
        j["filename"].alias("warc_path"),
        (~(shape_ok & json_ok)).alias("parse_failed"),
    )


def seeds_from_cdx(
    cdx: DataFrame,
    mime: str = "text/html",
    status: int = 200,
    limit: int | None = None,
) -> DataFrame:
    """Crawl seeds from an index: html-2xx captures, first capture per url
    (min fetch_ts — a map-side-combinable aggregate, no window), priority =
    epoch seconds of that first capture (earlier capture ⇒ smaller value ⇒
    scheduled sooner under the frontier's min-priority rule). ``limit``
    caps via top-k (TakeOrderedAndProject), never a global sort."""
    first = (
        cdx.filter(
            (~F.col("parse_failed"))
            & (F.col("http_status") == status)
            & (F.col("mime") == mime)
        )
        .groupBy("url")
        .agg(F.min("fetch_ts").alias("first_ts"))
        .select(
            "url",
            # unknown capture time sorts LAST (frontier = min-priority-first)
            F.coalesce(F.unix_timestamp("first_ts"), F.lit(1 << 62))
            .alias("priority"),
        )
    )
    if limit is not None:
        first = first.orderBy("priority", "url").limit(limit)
    return first


# -- pure-Python twin (oracle / tests) -----------------------------------------

def parse_cdx_line(line: str) -> dict:
    """Pure twin of one :func:`read_cdx` row (same field/None semantics)."""
    import re

    m = re.match(_LINE_RE, line, flags=re.DOTALL)
    out = {
        "urlkey": None, "fetch_ts": None, "url": None, "mime": None,
        "http_status": None, "digest": None, "warc_length": None,
        "warc_offset": None, "warc_path": None, "parse_failed": True,
    }
    if not m:
        return out
    out["urlkey"] = m.group(1)
    from datetime import datetime

    try:
        out["fetch_ts"] = datetime.strptime(m.group(2), "%Y%m%d%H%M%S")
    except ValueError:
        out["fetch_ts"] = None
    try:
        j = json.loads(m.group(3))
        if not isinstance(j, dict):
            raise ValueError
    except ValueError:
        return out

    def _i(key):
        v = j.get(key)
        try:
            return int(v) if v is not None else None
        except (TypeError, ValueError):
            return None

    out.update(
        url=j.get("url"), mime=j.get("mime"), http_status=_i("status"),
        digest=j.get("digest"), warc_length=_i("length"),
        warc_offset=_i("offset"), warc_path=j.get("filename"),
        parse_failed=j.get("url") is None,
    )
    return out
