"""URL canonicalization tests — hand-computed normal forms, the
degrade contract for non-URLs, and the JVM-only plan claim."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_scripts_spark.functions.urls import (
    canonical_url,
    url_host,
    url_registered_domain,
)


CASES = [
    # scheme/host case + default port + fragment
    ("HTTP://Example.ORG:80/Path/#frag", "http://example.org/Path"),
    ("https://x.io:443/a", "https://x.io/a"),
    ("https://x.io:8443/a", "https://x.io:8443/a"),  # non-default kept
    # query param order is transport noise; tracking params drop
    ("https://x.io/p?b=2&a=1", "https://x.io/p?a=1&b=2"),
    (
        "https://x.io/p?utm_source=tw&a=1&fbclid=abc&UTM_Campaign=x",
        "https://x.io/p?a=1",
    ),
    ("https://x.io/p?utm_source=tw", "https://x.io/p"),  # emptied query
    # userinfo drops; trailing host dot normalizes
    ("https://user:pw@example.org./x", "https://example.org/x"),
    # trailing slashes collapse (root included)
    ("https://x.io/a/b/", "https://x.io/a/b"),
    ("https://x.io/", "https://x.io"),
    # params that merely CONTAIN a tracking name survive
    ("https://x.io/p?myutm_source=1", "https://x.io/p?myutm_source=1"),
    ("https://x.io/p?gclid_x=1", "https://x.io/p?gclid_x=1"),
    # bare tracking param without '=' drops too
    ("https://x.io/p?fbclid&a=1", "https://x.io/p?a=1"),
    # non-URLs pass through unchanged
    ("not a url", "not a url"),
    ("/relative/path?b=1", "/relative/path?b=1"),
    (None, None),
]


def test_canonical_url_hand_computed(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "i int, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url("url").alias("c")).collect()
    }
    for i, (url, want) in enumerate(CASES):
        assert got[i] == want, url


def test_canonical_url_is_a_dedup_key(spark):
    """The point of the exercise: URL-noise variants of one page
    collapse to a single recrawl-merge key."""
    variants = [
        "HTTP://Example.org:80/page?b=2&a=1#top",
        "http://example.org/page/?a=1&b=2",
        "http://user@example.org/page?utm_source=x&a=1&b=2",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "url string")
    assert (
        df.select(canonical_url("url").alias("c")).distinct().count() == 1
    )


def test_url_host_and_registered_domain(spark):
    rows = [
        ("https://a.b.Example.co.uk/x", "a.b.example.co.uk", "example.co.uk"),
        ("https://news.example.org/x", "news.example.org", "example.org"),
        ("https://example.org/x", "example.org", "example.org"),
        ("https://localhost/x", "localhost", "localhost"),
        ("https://www.co.jp.example.com/x", "www.co.jp.example.com",
         "example.com"),  # two-level suffix NOT at the tail is ignored
    ]
    df = spark.createDataFrame(
        [(u,) for u, _, _ in rows], "url string"
    )
    got = df.select(
        "url",
        url_host("url").alias("h"),
        url_registered_domain("url").alias("d"),
    ).collect()
    for r, (_, h, d) in zip(sorted(got, key=lambda r: [u for u, _, _ in rows].index(r["url"])), rows):
        assert (r["h"], r["d"]) == (h, d), r["url"]


def test_canonical_url_stays_jvm_side(spark):
    """No Python in the hot path: the plan is one whole-stage-codegen
    projection — zero BatchEvalPython/ArrowEvalPython, zero exchanges."""
    df = spark.range(10).select(
        F.concat(F.lit("https://x.io/p?b="), F.col("id")).alias("url")
    )
    plan = (
        df.select(canonical_url("url"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
    assert "Exchange" not in plan
    # the array-HOF lambdas opt the projection out of whole-stage
    # fusion, but it is still ONE JVM-side Project over the scan
    assert "Project" in plan


def test_ip_literal_hosts(spark):
    """IP-literal hosts: bracketed IPv6 parses whole (not cut at the
    first ':'), and neither v4 nor v6 literals get eTLD+1 chopped —
    one politeness/quota bucket per ADDRESS."""
    rows = [
        ("https://[2001:db8::1]:8080/x", "[2001:db8::1]", "[2001:db8::1]"),
        ("https://[::1]/x", "[::1]", "[::1]"),
        ("https://192.168.0.1/x", "192.168.0.1", "192.168.0.1"),
        ("https://192.168.0.1:8080/a?b=1", "192.168.0.1", "192.168.0.1"),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in rows], "url string")
    got = {
        r["url"]: (r["h"], r["d"])
        for r in df.select(
            "url",
            url_host("url").alias("h"),
            url_registered_domain("url").alias("d"),
        ).collect()
    }
    for u, h, d in rows:
        assert got[u] == (h, d), u
    # canonical_url keeps the bracket form intact too
    c = df.select(canonical_url("url").alias("c")).collect()
    assert "https://[2001:db8::1]:8080/x" in {r["c"] for r in c}
