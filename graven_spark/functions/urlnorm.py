"""RFC 3986 URL normalization as a JVM-side column expression, with a
pure-Python twin for the DuckDB oracle and property tests.

Web-scale motivation: the frontier's seen-set dedup (SURVEY.md §2.2 P5,
§4.2.1) keys on the URL string, so syntactic aliases of one resource
(``HTTP://Host/a/../b`` vs ``http://host/b``) would be fetched twice and
split politeness accounting across rows. Normalization at admission
collapses them BEFORE the seen probe, shrinking the seen set and the
shuffle. It is opt-in (``crawl --normalize-urls``): the reference crawler
(/root/reference/graven/worker/crawler.py:74,80) does raw string concat
with no normalization, so replay parity keeps it off by default.

Scope (the RFC's *syntax-based* normalizations that preserve semantics
for every scheme):

- case: scheme and host lowercased (userinfo and path untouched)
- default port dropped (``http…:80``, ``https…:443``)
- fragment removed (never sent to the server)
- path dot-segments resolved per RFC 3986 §5.2.4 (``/a/./b/../c`` →
  ``/a/c``; a trailing ``/.`` or ``/..`` yields a trailing slash)
- empty path → ``/``

Percent-encoding case/decode normalization is deliberately out of scope:
it needs per-byte re-encoding decisions that would force Python into the
hot path; the five rules above are whole-stage-codegen string/array ops.

Both implementations share one algorithm by construction — the pure twin
mirrors the column expression step for step (same last-``@`` userinfo
split, same first-``/``-or-``?`` authority cut), and
tests/test_urlnorm.py property-checks them against each other.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["normalize_url", "normalize_url_py"]


# ---------------------------------------------------------------------------
# pure twin (oracle / VALUES literals)
# ---------------------------------------------------------------------------

def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 for an absolute path (starts with '/'); '' → '/'."""
    if path == "":
        return "/"
    out: list[str] = []
    for seg in path.split("/")[1:]:
        if seg == ".":
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    joined = "/" + "/".join(out)
    # '/a/.' → '/a/', '/a/b/..' → '/a/' (the RFC's replace-with-'/' steps)
    if (path.endswith("/.") or path.endswith("/..")) and not joined.endswith("/"):
        joined += "/"
    return joined


def normalize_url_py(url: str | None) -> str | None:
    """Pure-Python twin of :func:`normalize_url` (same algorithm, step for
    step). URLs without ``://`` pass through unchanged; None stays None."""
    if url is None or "://" not in url:
        return url
    u1 = url.split("#", 1)[0]
    if "://" not in u1:  # '://' lived in the fragment only
        return url if u1 == url else u1
    scheme_raw, rest = u1.split("://", 1)
    scheme = scheme_raw.lower()
    spos = rest.find("/")
    qpos = rest.find("?")
    ends = [p for p in (spos, qpos) if p >= 0]
    cut = min(ends) if ends else len(rest)
    authority, tail = rest[:cut], rest[cut:]
    hostport = authority.rsplit("@", 1)[-1]
    ui_prefix = authority[: len(authority) - len(hostport)]  # incl. '@'
    hp = hostport.lower()
    if scheme == "http" and hp.endswith(":80"):
        hp = hp[:-3]
    elif scheme == "https" and hp.endswith(":443"):
        hp = hp[:-4]
    if tail.startswith("?"):
        path_raw, query = "", tail
    else:
        path_raw = tail.split("?", 1)[0]
        query = tail[len(path_raw):]
    return scheme + "://" + ui_prefix + hp + _remove_dot_segments(path_raw) + query


# ---------------------------------------------------------------------------
# JVM-side column expression
# ---------------------------------------------------------------------------

def normalize_url(url: Column) -> Column:
    """Column form of :func:`normalize_url_py` — pure whole-stage-codegen
    string ops plus one higher-order ``aggregate`` fold for dot segments;
    no Python anywhere, so it is safe at frontier scale."""
    u1 = F.substring_index(url, "#", 1)
    scheme_raw = F.substring_index(u1, "://", 1)
    scheme = F.lower(scheme_raw)
    rest = u1.substr(F.length(scheme_raw) + 4, F.length(u1))

    spos = F.instr(rest, "/")
    qpos = F.instr(rest, "?")
    cut = (
        F.when((spos > 0) & ((qpos == 0) | (spos < qpos)), spos)
        .when(qpos > 0, qpos)
        .otherwise(F.length(rest) + 1)
    )
    authority = rest.substr(F.lit(1), cut - 1)
    tail = rest.substr(cut, F.length(rest))

    hostport = F.substring_index(authority, "@", -1)
    ui_prefix = authority.substr(  # includes the '@'; '' when no userinfo
        F.lit(1), F.length(authority) - F.length(hostport)
    )
    hp = F.lower(hostport)
    hp = (
        F.when((scheme == "http") & hp.endswith(":80"),
               hp.substr(F.lit(1), F.length(hp) - 3))
        .when((scheme == "https") & hp.endswith(":443"),
              hp.substr(F.lit(1), F.length(hp) - 4))
        .otherwise(hp)
    )

    path_raw = F.when(tail.startswith("?"), F.lit("")).otherwise(
        F.substring_index(tail, "?", 1)
    )
    query = tail.substr(F.length(path_raw) + 1, F.length(tail))

    # RFC 3986 §5.2.4 dot-segment fold over the path's '/'-split segments
    # (element 1 is the empty string before the leading '/', dropped).
    all_segs = F.split(path_raw, "/")
    segs = F.slice(all_segs, 2, F.greatest(F.size(all_segs) - 1, F.lit(0)))
    acc = F.aggregate(
        segs,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda a, s: (
            F.when(s == ".", a)
            .when(s == "..",
                  F.slice(a, 1, F.greatest(F.size(a) - 1, F.lit(0))))
            .otherwise(F.concat(a, F.array(s)))
        ),
    )
    path1 = F.concat(F.lit("/"), F.array_join(acc, "/"))
    needs_trail = path_raw.rlike("/\\.\\.?$")  # trailing '/.' or '/..'
    path_norm = (
        F.when(path_raw == "", F.lit("/"))
        .when(needs_trail & ~path1.endswith("/"), F.concat(path1, F.lit("/")))
        .otherwise(path1)
    )

    rebuilt = F.concat(scheme, F.lit("://"), ui_prefix, hp, path_norm, query)
    # '://' only inside the fragment → still "no scheme": strip fragment only
    return (
        F.when(~url.contains("://"), url)
        .when(~u1.contains("://"), u1)
        .otherwise(rebuilt)
    )
