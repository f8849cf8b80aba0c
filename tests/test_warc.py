"""WARC source tests: record walk, per-record-gzip-member layout (the
Common Crawl shape), HTTP split, corrupt-tail quarantine, bomb caps,
and the end-to-end crawl→documents chain."""

from __future__ import annotations

import gzip

import pytest

from hive_scripts_spark.sources.warc import (
    read_warc,
    split_http,
    warc_ingest_documents,
)


def _record(warc_type, payload: bytes, uri=None, rec_id="a1") -> bytes:
    head = [b"WARC/1.0", b"WARC-Type: " + warc_type.encode()]
    head.append(b"WARC-Record-ID: <urn:uuid:" + rec_id.encode() + b">")
    head.append(b"WARC-Date: 2026-01-02T03:04:05Z")
    if uri:
        head.append(b"WARC-Target-URI: " + uri.encode())
    if warc_type == "response":
        head.append(b"Content-Type: application/http; msgtype=response")
    else:
        head.append(b"Content-Type: application/warc-fields")
    head.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http(body: bytes, ctype=b"text/html; charset=utf-8") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype
        + b"\r\nContent-Length: " + str(len(body)).encode()
        + b"\r\n\r\n" + body
    )


@pytest.fixture()
def warc_dir(tmp_path):
    info = _record("warcinfo", b"software: test\r\n", rec_id="i0")
    r1 = _record(
        "response", _http(b"<html>hello page one</html>"),
        uri="https://example.org/one", rec_id="r1",
    )
    r2 = _record(
        "response", _http(b"<html>page two body</html>"),
        uri="https://example.org/two", rec_id="r2",
    )
    req = _record(
        "request", b"GET /one HTTP/1.1\r\n\r\n",
        uri="https://example.org/one", rec_id="q1",
    )
    (tmp_path / "plain.warc").write_bytes(info + r1 + req)
    # Common Crawl layout: EVERY record its own gzip member
    members = b"".join(gzip.compress(r) for r in (info, r2, req))
    (tmp_path / "members.warc.gz").write_bytes(members)
    return str(tmp_path)


def test_read_warc_plain_and_gzip_members(spark, warc_dir):
    out = read_warc(spark, warc_dir).collect()
    by_file = {}
    for r in out:
        by_file.setdefault(r["source_file"].rsplit("/", 1)[-1], []).append(r)
    plain = sorted(by_file["plain.warc"], key=lambda r: r["record_offset"])
    assert [r["warc_type"] for r in plain] == [
        "warcinfo", "response", "request"
    ]
    assert plain[1]["target_uri"] == "https://example.org/one"
    assert plain[1]["record_id"] == "<urn:uuid:r1>"
    assert plain[1]["warc_date"] == "2026-01-02T03:04:05Z"
    assert bytes(plain[1]["payload"]).startswith(b"HTTP/1.1 200 OK")
    assert plain[1]["content_length"] == len(bytes(plain[1]["payload"]))
    assert not any(r["truncated"] for r in plain)
    # the gzipped file walks ALL members, not just the first
    gz = sorted(
        by_file["members.warc.gz"], key=lambda r: r["record_offset"]
    )
    assert [r["warc_type"] for r in gz] == ["warcinfo", "response", "request"]
    assert gz[1]["target_uri"] == "https://example.org/two"


def test_split_http(spark, warc_dir):
    recs = read_warc(spark, warc_dir).where("warc_type = 'response'")
    out = {
        r["target_uri"]: r for r in split_http(recs).collect()
    }
    one = out["https://example.org/one"]
    assert one["http_status"] == 200
    assert one["http_content_type"] == "text/html; charset=utf-8"
    assert bytes(one["body"]) == b"<html>hello page one</html>"
    # non-HTTP payloads pass through with NULL status
    req = split_http(
        read_warc(spark, warc_dir).where("warc_type = 'request'")
    ).collect()[0]
    assert req["http_status"] is None
    assert bytes(req["body"]).startswith(b"GET /one")


def test_corrupt_tail_quarantined_not_fatal(spark, tmp_path):
    good = _record("response", _http(b"ok body"), uri="https://x/y")
    (tmp_path / "bad.warc").write_bytes(
        good + b"WARC/1.0\r\nContent-Length: 9999\r\n\r\nshort"
    )
    out = sorted(
        read_warc(spark, str(tmp_path)).collect(),
        key=lambda r: r["record_offset"],
    )
    assert [r["warc_type"] for r in out] == ["response", "_corrupt"]
    assert out[0]["target_uri"] == "https://x/y"
    assert out[1]["truncated"]


def test_payload_and_member_bomb_caps(spark, tmp_path):
    big = _record("response", _http(b"A" * 4096), uri="https://x/big")
    (tmp_path / "big.warc").write_bytes(big)
    out = read_warc(
        spark, str(tmp_path / "big.warc"), max_payload_bytes=512
    ).collect()[0]
    assert out["truncated"] and len(bytes(out["payload"])) == 512
    assert out["content_length"] > 512  # declared length survives the clip

    # a gzip bomb: 32 MiB of zeros compressing to ~32 KiB — the member
    # cap stops inflation and the file degrades instead of OOMing
    bomb = gzip.compress(b"\x00" * (32 << 20))
    (tmp_path / "bomb.warc.gz").write_bytes(bomb)
    rows = read_warc(
        spark, str(tmp_path / "bomb.warc.gz"),
        max_member_bytes=1 << 20,
    ).collect()
    assert all(r["truncated"] for r in rows)

    # the cap is PER MEMBER (self-review r14): many normal members
    # whose TOTAL exceeds the cap must all parse untruncated
    recs = [
        _record("response", _http(b"B" * 200_000),
                uri=f"https://x/{k}", rec_id=f"m{k}")
        for k in range(12)  # ~2.4 MB inflated total, 1 MiB member cap
    ]
    many = b"".join(gzip.compress(r) for r in recs)
    (tmp_path / "many.warc.gz").write_bytes(many)
    rows = read_warc(
        spark, str(tmp_path / "many.warc.gz"),
        max_member_bytes=1 << 20,
    ).collect()
    assert len(rows) == 12
    assert not any(r["truncated"] for r in rows)
    assert all(r["warc_type"] == "response" for r in rows)


def test_warc_cli_to_documents(spark, warc_dir, tmp_path, capsys):
    """`warc` subcommand e2e: shards -> documents parquet in the
    layout the curation subcommands consume, truncation counted."""
    from hive_scripts_spark.__main__ import main

    out = tmp_path / "db"
    rc = main(["warc", warc_dir, "--output", str(out), "--status-ok-only"])
    assert rc == 0
    docs = spark.read.parquet(str(out / "documents.parquet"))
    rows = {r["uri"]: r for r in docs.collect()}
    assert set(rows) == {
        "https://example.org/one", "https://example.org/two"
    }
    one = rows["https://example.org/one"]
    assert one["n_chars"] == len("<html>hello page one</html>")
    assert one["source"] == "example.org"
    assert "2 docs" in capsys.readouterr().out
    # the ingested table feeds the chunker directly
    rc = main(
        ["chunk", "--db", str(out), "--output", str(tmp_path / "chunks"),
         "--chunk-tokens", "3", "--overlap", "1"]
    )
    assert rc == 0
    assert spark.read.parquet(str(tmp_path / "chunks")).count() >= 2


def test_ingest_documents_chain(spark, warc_dir):
    docs = warc_ingest_documents(spark, warc_dir).collect()
    by_uri = {r["uri"]: r for r in docs}
    assert set(by_uri) == {
        "https://example.org/one", "https://example.org/two"
    }
    one = by_uri["https://example.org/one"]
    assert one["source"] == "example.org"
    assert one["text"] == "<html>hello page one</html>"
    assert one["http_status"] == 200
    assert isinstance(one["doc_id"], int)
    # deterministic ids across re-reads (stable join key)
    again = {
        r["uri"]: r["doc_id"]
        for r in warc_ingest_documents(spark, warc_dir).collect()
    }
    assert again == {u: r["doc_id"] for u, r in by_uri.items()}


def test_warc_cli_corrupt_count_respects_cap(spark, tmp_path, capsys):
    """Self-review r14: the CLI's corrupt-tail count comes from the
    SAME read (and cap) as the ingest — a record whose tail parses
    under a small payload clip must not be double-reported corrupt by
    a second default-cap pass."""
    from hive_scripts_spark.__main__ import main

    good = _record("response", _http(b"ok"), uri="https://x/a", rec_id="g")
    # declares an 8 KiB body but the file ends after 1000 bytes of it:
    # under a 512 B clip the record parses (clipped); under the default
    # 4 MiB cap it would classify corrupt
    partial = _record("response", _http(b"B" * 8192),
                      uri="https://x/b", rec_id="p")
    cut = good + partial[: len(partial) - (8192 - 1000) - 4]
    (tmp_path / "cut.warc").write_bytes(cut)
    out = tmp_path / "db"
    rc = main([
        "warc", str(tmp_path / "cut.warc"), "--output", str(out),
        "--max-payload-bytes", "512",
    ])
    assert rc == 0
    report = capsys.readouterr().out
    assert "2 docs" in report
    assert "corrupt record tails" not in report
    assert "truncated" in report  # the clipped record is flagged


def test_read_warc_stream_matches_batch(spark, warc_dir, tmp_path):
    """Streaming twin parity: an availableNow pass over the landing
    directory yields exactly the batch read's rows (same parse
    closure, stateless — the streaming.curation contract)."""
    from hive_scripts_spark.sources.warc import read_warc_stream

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        read_warc_stream(spark, warc_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "availableNow pass did not finish"

    def digest(df):
        return sorted(
            (
                r["source_file"].rsplit("/", 1)[-1],
                r["record_offset"],
                r["warc_type"],
                r["record_id"],
                r["content_length"],
                bytes(r["payload"]) if r["payload"] is not None else None,
                r["truncated"],
            )
            for r in df.collect()
        )

    streamed = digest(spark.read.parquet(out_dir))
    batch = digest(read_warc(spark, warc_dir))
    assert streamed == batch and len(streamed) == 6


def test_warc_cli_writes_quarantine(spark, tmp_path, capsys):
    """Corrupt tails are preserved on disk (the cmd_ingest quarantine
    contract), not just counted, and the host key is case-folded via
    the shared url_host extractor."""
    from hive_scripts_spark.__main__ import main

    good = _record(
        "response", _http(b"ok"),
        uri="HTTPS://User@Example.ORG:8443/x", rec_id="g",
    )
    (tmp_path / "bad.warc").write_bytes(
        good + b"WARC/1.0\r\nContent-Length: 9999\r\n\r\nshort"
    )
    out = tmp_path / "db"
    rc = main(["warc", str(tmp_path / "bad.warc"), "--output", str(out)])
    assert rc == 0
    assert "1 corrupt record tails" in capsys.readouterr().out
    q = spark.read.parquet(str(out / "_quarantine")).collect()
    assert len(q) == 1 and bytes(q[0]["payload"]).startswith(b"WARC/1.0")
    docs = spark.read.parquet(str(out / "documents.parquet")).collect()
    assert docs[0]["source"] == "example.org"


def test_warc_cli_robots_and_mojibake_flags(spark, tmp_path, capsys):
    """The r15 curation-chain flags: --robots drops disallowed URIs
    before any text work, --fix-mojibake repairs the survivors, and
    --clean-text strips invisibles + NFC-normalizes afterwards."""
    from hive_scripts_spark.__main__ import main
    from hive_scripts_spark.operators.robots import robots_rules

    blocked = _record(
        "response", _http(b"<html>secret</html>"),
        uri="https://example.org/private/x", rec_id="r1",
    )
    # mangled + a raw zero-width space (blocks whole-string repair
    # unless the repair-safe pre-strip runs) + a mangled BOM prefix
    # (repairs INTO an invisible the post-clean must strip) + a
    # latin-1-mangled em dash whose continuation bytes are C1
    # controls (review pass 4: a naive clean-first pass deleted them
    # and destroyed the repair forever)
    mangled_body = (
        "\u00ef\u00bb\u00bfcafÃ©\u200b â\u0080\u0094 page".encode("utf-8")
    )
    kept = _record(
        "response", _http(mangled_body),
        uri="https://example.org/ok", rec_id="r2",
    )
    shard = tmp_path / "shard.warc"
    shard.write_bytes(blocked + kept)

    rules = robots_rules(
        spark.createDataFrame(
            [("example.org", "User-agent: *\nDisallow: /private/\n")],
            "host string, payload string",
        )
    )
    rules_path = tmp_path / "rules"
    rules.write.mode("overwrite").parquet(str(rules_path))

    out = tmp_path / "db"
    rc = main(
        ["warc", str(shard), "--output", str(out),
         "--robots", str(rules_path), "--fix-mojibake", "--clean-text"]
    )
    assert rc == 0
    docs = spark.read.parquet(str(out / "documents.parquet")).collect()
    assert len(docs) == 1
    assert docs[0]["uri"] == "https://example.org/ok"
    assert docs[0]["text"] == "café \u2014 page"  # repaired + cleaned
    assert docs[0]["n_chars"] == len("café \u2014 page")
    assert "1 docs" in capsys.readouterr().out


def test_warc_cli_html_to_text_flag(spark, tmp_path):
    """--html-to-text runs the HTML extraction step the documented
    chain prescribes between ingest and repair (the r16 1M-doc e2e
    probe caught it missing from the CLI: every downstream gate was
    scoring tag soup). Markup and script subtrees drop, the mojibake
    inside the extracted text still repairs, and the crawl metadata
    columns survive the extraction batch (keep_cols, no re-join)."""
    from hive_scripts_spark.__main__ import main

    body = (
        "<html><head><title>t</title><script>var x=1;</script></head>"
        "<body><p>hello cafÃ© page</p><div>second line</div></body>"
        "</html>"
    ).encode("utf-8")
    rec = _record(
        "response", _http(body),
        uri="https://example.org/page", rec_id="r1",
    )
    shard = tmp_path / "shard.warc"
    shard.write_bytes(rec)

    out = tmp_path / "db"
    rc = main(
        ["warc", str(shard), "--output", str(out),
         "--html-to-text", "--fix-mojibake", "--clean-text"]
    )
    assert rc == 0
    docs = spark.read.parquet(str(out / "documents.parquet")).collect()
    assert len(docs) == 1
    row = docs[0]
    assert row["text"] == "hello café page\nsecond line"
    assert "<" not in row["text"] and "var x" not in row["text"]
    assert row["uri"] == "https://example.org/page"
    assert row["source"] == "example.org"
    assert row["http_status"] == 200
    assert row["n_chars"] == len(row["text"])
