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
  ``decompressobj`` loop capped PER MEMBER at ``max_member_bytes``
  (a cross-member total would truncate every normal multi-member
  shard); each record's emitted payload is clipped at
  ``max_payload_bytes`` with a ``truncated`` flag, and payload bytes
  beyond the clip are skipped WITHOUT buffering — the record walk is
  incremental, so peak task memory is O(max_payload), not O(inflated
  file), and one hostile record cannot OOM an executor.
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
    return raw.select("path", "content").mapInPandas(
        _build_parse(max_payload_bytes, max_member_bytes), WARC_SCHEMA
    )


def _build_parse(max_payload_bytes: int, max_member_bytes: int):
    """Factory for the record-parse closure shared by :func:`read_warc`
    and :func:`read_warc_stream`. The returned function is NESTED (its
    qualname carries ``<locals>``), so cloudpickle serializes it BY
    VALUE — a module-level parse function would pickle by reference
    and die with ModuleNotFoundError on the driver's vanilla workers
    (verify-gates rule)."""

    def parse(batches):
        # EVERYTHING needed on the executor is defined inside this
        # closure — the driver runs a vanilla session from its own
        # cwd, so module-level names from this repo do not unpickle
        # on workers (verify-gates rule).
        import zlib

        import pandas as pd

        MAX_HEADER = 1 << 20  # a record header block beyond 1 MiB is hostile
        CHUNK = 1 << 20

        class Walker:
            """Incremental WARC record parser. Inflated bytes stream
            through ``feed``; records emit as soon as their header +
            clipped payload are buffered, and payload bytes beyond
            ``max_payload_bytes`` are SKIPPED without buffering — peak
            memory is O(max_payload + max header), never O(file)
            (self-review r14: the first version inflated the whole
            file into one buffer, which at a ~4 GB-inflated crawl
            shard per task is exactly the OOM the caps exist to
            prevent)."""

            def __init__(self, name):
                self.name = name
                self.buf = bytearray()
                self.skip = 0
                self.rows = []
                self.ordinal = 0
                self.dead = False

            def corrupt(self):
                if self.dead:
                    return
                self.rows.append(
                    (self.name, self.ordinal, "_corrupt", None, None,
                     None, None, None,
                     bytes(self.buf[:max_payload_bytes]), True)
                )
                self.buf.clear()
                self.dead = True

            def feed(self, chunk):
                if self.dead:
                    return
                self.buf += chunk
                self._drain(final=False)

            def finish(self):
                if not self.dead:
                    self._drain(final=True)
                    if not self.dead and self.buf.strip(b"\r\n"):
                        self.corrupt()  # non-blank truncated tail
                return self.rows

            def _drain(self, final):
                b = self.buf
                while not self.dead:
                    if self.skip:
                        n = min(self.skip, len(b))
                        del b[:n]
                        self.skip -= n
                        if self.skip:
                            return
                    i = 0
                    while b[i : i + 2] == b"\r\n":
                        i += 2
                    if i:
                        del b[:i]
                    if not b:
                        return
                    head = bytes(b[:5])
                    if len(b) < 5:
                        if b"WARC/".startswith(head) and not final:
                            return  # maybe a prefix — wait for more
                        self.corrupt()
                        return
                    if head != b"WARC/":
                        self.corrupt()
                        return
                    hdr_end = b.find(b"\r\n\r\n")
                    if hdr_end < 0:
                        if final or len(b) > MAX_HEADER:
                            self.corrupt()
                        return
                    headers = {}
                    for line in bytes(b[:hdr_end]).split(b"\r\n")[1:]:
                        k, sep, v = line.partition(b":")
                        if sep:
                            headers[k.strip().lower()] = v.strip()
                    try:
                        clen = int(headers.get(b"content-length", b""))
                    except ValueError:
                        clen = -1
                    if clen < 0:
                        self.corrupt()
                        return
                    keep = min(clen, max_payload_bytes)
                    body_start = hdr_end + 4
                    if len(b) < body_start + keep:
                        if final:
                            self.corrupt()
                        return
                    payload = bytes(b[body_start : body_start + keep])

                    def h(key):
                        v = headers.get(key)
                        return (
                            v.decode("utf-8", "replace")
                            if v is not None else None
                        )

                    self.rows.append(
                        (
                            self.name,
                            self.ordinal,
                            (h(b"warc-type") or "").lower() or None,
                            h(b"warc-record-id"),
                            h(b"warc-target-uri"),
                            h(b"warc-date"),
                            h(b"content-type"),
                            clen,
                            payload,
                            clen > keep,
                        )
                    )
                    self.ordinal += 1
                    del b[: body_start + keep]
                    self.skip = clen - keep

        def walk_gzip(blob, w):
            """Per-MEMBER bomb cap (the documented semantics — a
            cross-member cap would truncate every normal multi-member
            crawl shard at the cap): a member that inflates past
            ``max_member_bytes``, or ends mid-stream, quarantines the
            rest of the file; records already emitted are kept."""
            data = blob
            while data[:2] == b"\x1f\x8b" and not w.dead:
                d = zlib.decompressobj(wbits=31)
                produced = 0
                buf = data
                ok = False
                try:
                    while True:
                        budget = max_member_bytes - produced
                        if budget <= 0:
                            break  # bomb: this member alone broke the cap
                        out = d.decompress(buf, min(budget, CHUNK))
                        produced += len(out)
                        w.feed(out)
                        if d.eof:
                            ok = True
                            break
                        buf = d.unconsumed_tail
                        if not buf and not out:
                            break  # member ran out of input mid-stream
                except zlib.error:
                    ok = False
                if not ok:
                    w.corrupt()
                    return
                data = d.unused_data
            if data.strip() and not w.dead:
                w.corrupt()  # trailing non-gzip garbage

        def parse_file(name: str, blob: bytes):
            w = Walker(name)
            if blob[:2] == b"\x1f\x8b":
                walk_gzip(blob, w)
            else:
                w.feed(blob)
            return w.finish()

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

    return parse


def read_warc_stream(
    spark: SparkSession,
    path: str,
    max_payload_bytes: int = 4 * 1024 * 1024,
    max_member_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Streaming twin of :func:`read_warc` — a file-source stream over
    a landing directory of crawl shards, one parsed record row per
    WARC record as shards ARRIVE (the continuous-ingest shape: the
    crawler drops ``.warc.gz`` files, Structured Streaming discovers
    and parses them exactly once per the file-source contract).

    The parse is the SAME stateless ``mapInPandas`` as batch, so each
    discovered file yields byte-identical rows to a batch read of that
    file (parity-pinned in ``tests/test_warc.py``) — append mode, no
    watermark, no state store. Downstream: ``split_http`` and the
    documents projection are stateless too and chain unchanged;
    cross-shard dedup composes via ``streaming.stateful`` keyed state,
    the curation split documented in ``streaming/curation.py``.
    """
    raw = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, "
        "length long, content binary"
    ).load(path)
    return raw.select("path", "content").mapInPandas(
        _build_parse(max_payload_bytes, max_member_bytes), WARC_SCHEMA
    )


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
    records: DataFrame | None = None,
) -> DataFrame:
    """The end-to-end crawl→documents chain: WARC records → HTTP
    responses → UTF-8 text bodies keyed by URI, in the documents-table
    shape (doc_id via a stable hash of record id, source = host).
    Text extraction here is the honest byte→utf8 step; HTML boilerplate
    removal chains through ``textstats.html_to_text`` /
    ``strip_boilerplate`` downstream.

    Pass ``records`` (a — typically cached — :func:`read_warc` result)
    to reuse one parse for several consumers (the ``warc`` CLI counts
    corrupt tails from the SAME read it ingests from — re-parsing a
    shard set for a log line would double the job, the ``cmd_ingest``
    lesson).
    """
    recs = (
        records
        if records is not None
        else read_warc(spark, path, max_payload_bytes=max_payload_bytes)
    )
    resp = split_http(recs.where(F.col("warc_type") == "response"))
    from hive_scripts_spark.functions.urls import url_host

    return resp.select(
        F.xxhash64("record_id").alias("doc_id"),
        # the shared host extractor (case-folded, userinfo/port
        # stripped) — a second hand-rolled host regex here would split
        # one site across several per-source keys
        url_host("target_uri").alias("source"),
        F.col("target_uri").alias("uri"),
        F.col("warc_date"),
        F.col("http_status"),
        F.col("http_content_type"),
        F.decode(F.col("body"), "UTF-8").alias("text"),
        F.col("truncated"),
    )
