"""Vectorized Arrow extraction UDFs (BASELINE.json input_hint: "vectorized
pandas/Arrow UDFs (no per-row Python) throughout").

Two UDFs only — the whole Python surface of the hot path:

- ``extract_text``: HTML bytes → text, byte-identical per url to the golden
  ``pages.text`` column. Pure vectorized pandas ``.str`` ops (regex tag strip
  + whitespace collapse), the same transformation ``core.extract_text_py``
  defines.
- ``extract_links``: HTML bytes → array<struct<href,is_dir,ts_str>> + a
  parse_failed flag, using the byte-exact reference regex
  (/root/reference/graven/worker/crawler.py:24-25) in ``re.finditer``
  document order. A multi-group alternation regex returning a struct array
  cannot be expressed with ``regexp_extract_all`` (SURVEY.md §2.2 P1), so
  this one UDF carries the per-document ``finditer`` loop; batches move via
  Arrow.

Everything downstream of these (absolutize, dedup, joins, windows) is
JVM-side Catalyst.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import extract_links_strict_py

# Mirrors core.extract_text_py, expressed as vectorized pandas ops.
_TAG_PATTERN = r"<[^>]*>"
_WS_PATTERN = r"\s+"


def _text_kernel(html: pd.Series) -> pd.Series:
    return (
        html.map(lambda b: b.decode("utf-8", errors="replace"), na_action="ignore")
        .str.replace(_TAG_PATTERN, " ", regex=True)
        .str.replace(_WS_PATTERN, " ", regex=True)
        .str.strip()
    )


def _memoized(kernel):
    """Batch-local content dedup: run ``kernel`` once per DISTINCT body
    within each Arrow batch, then fan results back to rows.

    Zero-shuffle complement to :func:`dedup_body_extract` — template
    duplicates (dir listings, mirror pages) recur within every batch, so
    local memoization captures most of the win of the global groupBy plan
    without moving a byte between executors. Byte-identical bodies produce
    byte-identical outputs, so results are unchanged.
    """

    def wrapped(html: pd.Series):
        uniq = html.drop_duplicates()
        out_u = kernel(uniq)
        take = html.map({b: i for i, b in enumerate(uniq)}).to_numpy()
        return out_u.iloc[take].reset_index(drop=True)

    return wrapped


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """HTML binary → extracted text (golden-byte-identical invariant)."""
    return _text_kernel(html)


@F.pandas_udf(T.StringType())
def extract_text_memo(html: pd.Series) -> pd.Series:
    """`extract_text` with batch-local content dedup (``--dedup-content``)."""
    return _memoized(_text_kernel)(html)


LINKS_TYPE = T.StructType(
    [
        T.StructField(
            "links",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("href", T.StringType()),
                        T.StructField("is_dir", T.BooleanType()),
                        T.StructField("ts_str", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("parse_failed", T.BooleanType()),
    ]
)


def dedup_body_extract(keyed, udf, out_col, html_col="html", sha_col="body_sha"):
    """Run an extraction UDF once per DISTINCT page body (``--dedup-content``).

    ``keyed`` must already carry ``sha_col`` (``sha2(html, 256)``). The bodies
    are grouped on the sha — ``first(html)`` gets a map-side partial combine,
    so the shuffle carries at most one body per distinct hash per input
    partition — the UDF runs over that (much smaller) distinct set, and the
    per-body outputs join back to the URL rows on the sha. Byte-identical
    bodies extract to byte-identical results, so outputs are unchanged vs the
    per-URL path (equivalence-tested in tests/test_dedup_content.py).

    The join-back carries NO broadcast hint on purpose: the distinct-body set
    is unbounded (a low-duplication corpus leaves it nearly the full input),
    so forcing a broadcast is a driver/executor-memory hazard at scale — and
    measurably slower even at 60k pages (bench `dedup_extract` micro). With
    AQE on (session default) Catalyst converts the post-shuffle join to a
    broadcast at runtime exactly when the distinct side turns out small
    (mirror-heavy corpora), which is the only case the hint would have been
    right. Worth enabling when duplication is high or per-body extraction is
    expensive; at ~30% duplication the sha+shuffle overhead exceeds the
    saved UDF time (same micro). Returns ``keyed`` minus
    ``html_col``/``sha_col`` plus ``out_col``.
    """
    per_body = (
        keyed.select(sha_col, html_col)
        .groupBy(sha_col)
        .agg(F.first(html_col).alias(html_col))
        .select(sha_col, udf(F.col(html_col)).alias(out_col))
    )
    return (
        keyed.drop(html_col)
        .join(per_body, sha_col, "inner")
        .drop(sha_col)
    )


def _links_kernel(html: pd.Series) -> pd.DataFrame:
    def one(b: bytes | None) -> tuple[list[tuple[str, bool, str | None]], bool]:
        if b is None:
            return [], False
        links, failed = extract_links_strict_py(b)
        return [(l.href, l.is_dir, l.ts_str) for l in links], failed

    parsed = html.map(one)
    return pd.DataFrame(
        {"links": parsed.map(lambda t: t[0]), "parse_failed": parsed.map(lambda t: t[1])}
    )


@F.pandas_udf(LINKS_TYPE)
def extract_links(html: pd.Series) -> pd.DataFrame:
    """HTML binary → (document-order link structs, parse_failed flag)."""
    return _links_kernel(html)


@F.pandas_udf(LINKS_TYPE)
def extract_links_memo(html: pd.Series) -> pd.DataFrame:
    """`extract_links` with batch-local content dedup (``--dedup-content``)."""
    return _memoized(_links_kernel)(html)
