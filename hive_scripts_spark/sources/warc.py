"""WARC (ISO 28500) ingestion — the Common Crawl container, i.e. the
de-facto raw source of web pretraining corpora (reference parity:
``verizon_automation_script.sh`` reads fixed-width exports; this is
the LLM-pipeline source extension on the same "files in, table out"
surface as :func:`hive_scripts_spark.sources.readers.read_jsonl`).

A WARC file is a sequence of records, each a CRLF-line header block
(``WARC/1.0`` + ``Name: value`` lines, blank-line terminated) followed
by exactly ``Content-Length`` payload bytes and a blank-line gap.
Common Crawl ships ``.warc.gz`` with EVERY RECORD ITS OWN GZIP MEMBER
(the standard's random-access layout) — a stream decompressor that
stops at one member would silently read one record per file.

Scale posture:

* **One task per file, no splitting**: the read rides Spark's
  ``binaryFile`` source, so a 100 TB crawl (≈100k ~1 GB shards)
  parallelizes at its natural unit — the shard — with zero shuffle;
  record parsing is a ``mapInPandas`` pass (Arrow-batched, helpers
  defined inside the closure per the repo's vanilla-pickling rule).
* **Decompression-bomb caps** (the multimodal posture applied to a
  text container): each gzip member inflates through a bounded
  ``decompressobj`` loop that stops at ``max_member_bytes``; each
  record's emitted payload is clipped at ``max_payload_bytes`` with a
  ``truncated`` flag, so one hostile record cannot OOM an executor.
* **Corrupt records degrade, never kill** (the ``read_jsonl``
  contract): a malformed header block or short payload ends that
  FILE's walk at the failure point — records already parsed are kept,
  the rest of the file lands in one quarantine row
  (``warc_type='_corrupt'``) so a billion-record crawl ingest
  surfaces damage without failing the job.

Typical chain: ``read_warc`` → filter ``warc_type = 'response'`` →
``split_http`` (status/headers/body) → text extraction → the
documents table the dedup/quality/decontamination operators consume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: output schema of read_warc (payload is the raw record block —
#: for response records that is the full HTTP message)
WARC_SCHEMA = (
    "source_file string, record_offset bigint, warc_type string, "
    "record_id string, target_uri string, warc_date string, "
    "content_type string, content_length bigint, payload binary, "
    "truncated boolean"
)

#: output schema added by split_http
HTTP_SCHEMA = (
    "http_status int, http_content_type string, body binary"
)


def read_warc(
    spark: SparkSession,
    path: str,
    max_payload_bytes: int = 4 * 1024 * 1024,
    max_member_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Read WARC / gzipped-WARC files under ``path`` into one record
    row per WARC record (schema :data:`WARC_SCHEMA`).

    ``record_offset`` is the record's ordinal within its file (a
    stable join key for re-reads of the same shard set);
    ``truncated`` marks payloads clipped at ``max_payload_bytes`` or
    members stopped at ``max_member_bytes``.
    """
    raw = spark.read.format("binaryFile").load(path)

    def parse(batches):
        # EVERYTHING needed on the executor is defined inside this
        # closure — the driver runs a vanilla session from its own
        # cwd, so module-level names from this repo do not unpickle
        # on workers (verify-gates rule).
        import zlib

        import pandas as pd

        def gunzip_members(b: bytes):
            """Concatenated-gzip-member inflate, bomb-capped: feeds
            ``unconsumed_tail`` back while a member is mid-stream
            (``unused_data`` only carries bytes AFTER a member ends),
            stops the whole walk at ``max_member_bytes`` total."""
            out = bytearray()
            truncated = False
            data = b
            while data[:2] == b"\x1f\x8b" and not truncated:
                d = zlib.decompressobj(wbits=31)
                buf = data
                try:
                    while True:
                        budget = max_member_bytes - len(out)
                        if budget <= 0:
                            truncated = True
                            break
                        out += d.decompress(buf, budget)
                        if d.eof:
                            break
                        buf = d.unconsumed_tail
                        if not buf:
                            # member ran out of input mid-stream
                            truncated = True
                            break
                except zlib.error:
                    truncated = True
                    break
                if not d.eof:
                    break
                data = d.unused_data
            return bytes(out), truncated

        def parse_file(name: str, blob: bytes):
            truncated_inflate = False
            if blob[:2] == b"\x1f\x8b":
                blob, truncated_inflate = gunzip_members(blob)
            rows = []
            i, n, ordinal = 0, len(blob), 0
            while i < n:
                # skip inter-record CRLFs
                while i < n and blob[i : i + 2] == b"\r\n":
                    i += 2
                if i >= n:
                    break
                if not blob.startswith(b"WARC/", i):
                    rows.append(
                        (name, ordinal, "_corrupt", None, None, None,
                         None, None,
                         blob[i : i + max_payload_bytes], True)
                    )
                    break
                hdr_end = blob.find(b"\r\n\r\n", i)
                if hdr_end < 0:
                    rows.append(
                        (name, ordinal, "_corrupt", None, None, None,
                         None, None,
                         blob[i : i + max_payload_bytes], True)
                    )
                    break
                headers = {}
                for line in blob[i:hdr_end].split(b"\r\n")[1:]:
                    k, _, v = line.partition(b":")
                    if _:
                        headers[k.strip().lower()] = v.strip()
                try:
                    clen = int(headers.get(b"content-length", b""))
                except ValueError:
                    clen = -1
                body_start = hdr_end + 4
                if clen < 0 or body_start + clen > n:
                    rows.append(
                        (name, ordinal, "_corrupt", None, None, None,
                         None, None,
                         blob[i : i + max_payload_bytes], True)
                    )
                    break

                def h(key: bytes):
                    v = headers.get(key)
                    return v.decode("utf-8", "replace") if v is not None else None

                payload = blob[body_start : body_start + clen]
                clipped = len(payload) > max_payload_bytes
                rows.append(
                    (
                        name,
                        ordinal,
                        (h(b"warc-type") or "").lower() or None,
                        h(b"warc-record-id"),
                        h(b"warc-target-uri"),
                        h(b"warc-date"),
                        h(b"content-type"),
                        clen,
                        payload[:max_payload_bytes],
                        clipped or truncated_inflate,
                    )
                )
                ordinal += 1
                i = body_start + clen
            return rows

        cols = [
            "source_file", "record_offset", "warc_type", "record_id",
            "target_uri", "warc_date", "content_type", "content_length",
            "payload", "truncated",
        ]
        for pdf in batches:
            out = []
            for name, blob in zip(pdf["path"], pdf["content"]):
                out.extend(parse_file(name, bytes(blob)))
            yield pd.DataFrame(out, columns=cols)

    return raw.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def split_http(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Split HTTP response payloads (``warc_type='response'`` rows)
    into status / content-type / body columns (appends
    :data:`HTTP_SCHEMA`); non-HTTP payloads get NULL status and the
    whole payload as body. Map-only — no exchange."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + HTTP_SCHEMA

    def split(batches):
        import pandas as pd

        def one(b: bytes):
            if b is None:
                return None, None, None
            b = bytes(b)
            if not b.startswith(b"HTTP/"):
                return None, None, b
            end = b.find(b"\r\n\r\n")
            if end < 0:
                return None, None, b
            lines = b[:end].split(b"\r\n")
            parts = lines[0].split(None, 2)
            try:
                status = int(parts[1])
            except (IndexError, ValueError):
                return None, None, b
            ctype = None
            for line in lines[1:]:
                k, _, v = line.partition(b":")
                if _ and k.strip().lower() == b"content-type":
                    ctype = v.strip().decode("utf-8", "replace")
                    break
            return status, ctype, b[end + 4 :]

        for pdf in batches:
            trip = [one(v) for v in pdf[payload_col]]
            pdf = pdf.copy()
            pdf["http_status"] = pd.array(
                [t[0] for t in trip], dtype="Int32"
            )
            pdf["http_content_type"] = [t[1] for t in trip]
            pdf["body"] = [t[2] for t in trip]
            yield pdf

    return df.mapInPandas(split, out_schema)


def warc_ingest_documents(
    spark: SparkSession,
    path: str,
    max_payload_bytes: int = 4 * 1024 * 1024,
) -> DataFrame:
    """The end-to-end crawl→documents chain: WARC records → HTTP
    responses → UTF-8 text bodies keyed by URI, in the documents-table
    shape (doc_id via a stable hash of record id, source = host).
    Text extraction here is the honest byte→utf8 step; HTML boilerplate
    removal chains through ``textstats.strip_boilerplate`` downstream.
    """
    recs = read_warc(spark, path, max_payload_bytes=max_payload_bytes)
    resp = split_http(recs.where(F.col("warc_type") == "response"))
    return resp.select(
        F.xxhash64("record_id").alias("doc_id"),
        F.regexp_extract("target_uri", r"^[a-z]+://([^/]+)", 1).alias(
            "source"
        ),
        F.col("target_uri").alias("uri"),
        F.col("warc_date"),
        F.col("http_status"),
        F.col("http_content_type"),
        F.decode(F.col("body"), "UTF-8").alias("text"),
        F.col("truncated"),
    )
