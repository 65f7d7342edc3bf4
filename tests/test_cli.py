"""CLI surface (python -m graven_spark …): crawl from a CSV seed file,
resume via state dir, export results — the reference's ``graven run`` /
``graven export`` entry points (/root/reference/graven/__main__.py)."""

from __future__ import annotations

import json
import os

from graven_spark.__main__ import main, read_seeds


def test_read_seeds_csv_order(spark, tmp_path):
    p = tmp_path / "seeds.csv"
    p.write_text("https://b.example.com/r\nhttps://a.example.com/r\n")
    rows = read_seeds(spark, str(p)).orderBy("seed_rank").collect()
    assert [(r.seed_rank, r.url) for r in rows] == [
        (0, "https://b.example.com/r"),
        (1, "https://a.example.com/r"),
    ]  # file order = priority (cli_parser.py:246-259 semantics)


def test_cli_crawl_and_export(spark, smoke_graph, tmp_path):
    pages = str(tmp_path / "pages.parquet")
    smoke_graph.pages.to_parquet(pages, index=False)
    seeds_csv = tmp_path / "seeds.csv"
    seeds_csv.write_text(
        "\n".join(smoke_graph.seeds.sort_values("seed_rank")["url"]) + "\n"
    )
    state = str(tmp_path / "state")

    rc = main([
        "crawl", "--pages", pages, "--seeds", str(seeds_csv), "--state", state,
        "--bloom-buckets", "4", "--bloom-bits", str(1 << 16),
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(state, "round_000000", "_COMMIT"))

    out = str(tmp_path / "export")
    rc = main(["export", "--state", state, "--out", out, "--format", "json"])
    assert rc == 0
    rows = []
    for name in os.listdir(out):
        if name.endswith(".json"):
            with open(os.path.join(out, name)) as f:
                rows += [json.loads(line) for line in f if line.strip()]
    assert len(rows) > 50
    assert {"url", "text", "depth", "round"} <= set(rows[0])

    # archive export (reference SBOM-archive analog, graven_database.py:407-448)
    import tarfile
    import zipfile

    zpath = str(tmp_path / "results.zip")
    assert main(["export", "--state", state, "--out", zpath, "--format", "zip"]) == 0
    with zipfile.ZipFile(zpath) as z:
        zrows = []
        for name in z.namelist():
            zrows += [json.loads(ln) for ln in z.read(name).decode().splitlines() if ln.strip()]
    assert len(zrows) == len(rows)

    tpath = str(tmp_path / "results.tar.gz")
    assert main(["export", "--state", state, "--out", tpath, "--format", "tar.gz"]) == 0
    with tarfile.open(tpath, "r:gz") as t:
        trows = []
        for m in t.getmembers():
            trows += [
                json.loads(ln)
                for ln in t.extractfile(m).read().decode().splitlines()
                if ln.strip()
            ]
    assert len(trows) == len(rows)

    # --update-jar re-process keeps one row per url with identical text
    rc = main([
        "crawl", "--pages", pages, "--seeds", str(seeds_csv), "--state", state,
        "--update-jar", "https://host0.example.com/maven2/",
        "--bloom-buckets", "4", "--bloom-bits", str(1 << 16),
    ])
    assert rc == 0
    out2 = str(tmp_path / "export2")
    assert main(["export", "--state", state, "--out", out2, "--format", "json"]) == 0
    rows2 = []
    for name in os.listdir(out2):
        if name.endswith(".json"):
            with open(os.path.join(out2, name)) as f:
                rows2 += [json.loads(line) for line in f if line.strip()]
    assert {r["url"]: r["text"] for r in rows2} == {r["url"]: r["text"] for r in rows}


def test_iceberg_shim_gated(spark):
    """No Iceberg jars in this container: availability probe is honest and
    the shim refuses with an actionable message (parquet store is default)."""
    import pytest

    from graven_spark.sources.catalog import IcebergSeenTable, iceberg_available

    assert iceberg_available(spark) is False
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        IcebergSeenTable(spark, "cat.db.seen")
