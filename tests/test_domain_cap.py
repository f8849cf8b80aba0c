"""Tests for per-domain quota capping (`curation.cap_per_domain`) and
the sizing report (`curation.domain_report`).

Expected picks are recomputed independently in Python (hashlib md5
over the stringified id — the same portable pick order Spark
evaluates), and the salted two-level form is compared against the
plain single-window replay on a hot-domain corpus.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hive_scripts_spark.operators.curation import cap_per_domain, domain_report


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string")


def _expected_picks(rows, cap):
    by_domain: dict[str, list] = {}
    from urllib.parse import urlsplit

    for doc_id, url in rows:
        host = (urlsplit(url).hostname or "") if "://" in url else ""
        parts = host.split(".")
        domain = host if len(parts) <= 2 else ".".join(parts[-2:])
        by_domain.setdefault(domain, []).append(doc_id)
    keep = set()
    for ids in by_domain.values():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        keep.update(ids[:cap])
    return keep


def test_cap_and_md5_pick_order(spark):
    rows = [(i, f"https://site{i % 3}.com/p{i}") for i in range(30)]
    out = cap_per_domain(_docs(spark, rows), cap=4).collect()
    got = {r["doc_id"] for r in out}
    assert got == _expected_picks(rows, 4)
    assert len(got) == 12  # 3 domains x 4
    # schema: helper + rank columns dropped by default
    assert {f for f in out[0].asDict()} == {"doc_id", "url"}


def test_subdomains_share_one_quota(spark):
    rows = [(i, f"https://sub{i}.example.com/x") for i in range(10)]
    rows += [(100, "https://other.net/y")]
    out = cap_per_domain(_docs(spark, rows), cap=3).collect()
    by_url = [r["doc_id"] for r in out if "example.com" in r["url"]]
    assert len(by_url) == 3  # ten subdomains, ONE eTLD+1 quota
    assert any(r["doc_id"] == 100 for r in out)


def test_hot_domain_equals_window_form(spark):
    """Salting is bit-transparent: a 90%-hot corpus capped by the
    salted two-level form must equal the plain single-window replay."""
    from pyspark.sql.window import Window

    rows = [(i, "https://hot.com/a") for i in range(90)]
    rows += [(1000 + i, f"https://cold{i}.org/b") for i in range(10)]
    docs = _docs(spark, rows)
    got = sorted(
        r["doc_id"] for r in cap_per_domain(docs, cap=5).collect()
    )
    from hive_scripts_spark.functions.urls import url_registered_domain

    w = Window.partitionBy(url_registered_domain("url")).orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    want = sorted(
        r["doc_id"]
        for r in docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .collect()
    )
    assert got == want and len(got) == 5 + 10


def test_hostless_urls_capped_in_one_bucket(spark):
    rows = [(i, "not a url at all") for i in range(6)]
    out = cap_per_domain(_docs(spark, rows), cap=2).collect()
    assert len(out) == 2  # '' bucket capped, not passed through


def test_keep_rank_and_guards(spark):
    docs = _docs(spark, [(1, "https://a.com/x")])
    ranked = cap_per_domain(docs, cap=1, keep_rank=True).collect()[0]
    assert ranked["pick_order"] == 1
    with pytest.raises(ValueError, match="cap must be >= 1"):
        cap_per_domain(docs, cap=0)
    clashing = docs.withColumn("__domain", F.lit("x"))
    with pytest.raises(ValueError, match="__domain"):
        cap_per_domain(clashing)


def test_null_ids_raise(spark):
    """md5(NULL) sorts first and ties — NULL ids would monopolize the
    quota with nondeterministic picks, so they fail loudly."""
    docs = spark.createDataFrame(
        [(None, "https://a.com/x"), (2, "https://a.com/y")],
        "doc_id long, url string",
    )
    with pytest.raises(Exception, match="contains NULLs"):
        cap_per_domain(docs, cap=1).collect()


def test_domain_report_counts(spark):
    rows = [(1, "https://a.example.com/1"), (2, "https://b.example.com/2"),
            (3, "https://other.net/3")]
    got = {
        r["domain"]: r["n_docs"]
        for r in domain_report(_docs(spark, rows)).collect()
    }
    assert got == {"example.com": 2, "other.net": 1}
