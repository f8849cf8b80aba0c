"""Incremental (manifest-diff) reconciliation — the 100 TB upgrade of
UC#1.

The reference re-counts every table/partition on every run
(``verizon_automation_script.sh:90-183``); at lake scale that is a full
re-scan of unchanged data. This module prunes the work with **file
manifests**: list each side's parquet files with metadata only (path,
byte length, mtime), roll them up per Hive-style ``k=v`` partition
directory, and re-run the count reconciliation ONLY for partitions whose
manifest changed since the saved state (or differs between the sides).

Scale posture:

* the listing uses Spark's ``binaryFile`` source but selects ONLY its
  metadata columns — column pruning means file *content* is never read,
  so a manifest over N files costs O(N) metadata operations distributed
  across the cluster, not O(bytes);
* the manifest rollup is one tiny groupBy over O(files) rows;
* the subsequent data scan carries an ``isin`` filter on the partition
  columns, which lands in ``PartitionFilters`` → unchanged partition
  directories are skipped at planning time, never opened.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_manifest(
    spark: SparkSession, table_dir: str, partition_cols: list[str]
) -> DataFrame:
    """Per-partition manifest of a Hive-layout parquet table:
    ``(partition values..., n_files, total_bytes, max_mtime)``.

    Partition values are parsed from the ``k=v`` path segments, so this
    never opens a file. (``binaryFile`` with only metadata columns
    selected — content is lazily loaded per-column and pruned away.)

    Values are kept as the RAW (Hive path-escaped) segment — consistent
    across runs and sides, so manifest-vs-manifest diffs are exact;
    :func:`changed_partition_filter` unescapes them before they meet
    actual column values. The ``(?:^|/)`` anchor stops a column named
    ``e`` from matching inside another column's ``zone=...`` segment.
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(table_dir)
        .select("path", "length", "modificationTime")
    )
    part_vals = [
        F.regexp_extract(F.col("path"), f"(?:^|/){c}=([^/]+)", 1).alias(c)
        for c in partition_cols
    ]
    return (
        files.select(*part_vals, "length", "modificationTime")
        .groupBy(*partition_cols)
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("length").alias("total_bytes"),
            F.max("modificationTime").alias("max_mtime"),
        )
    )


def manifest_diff(
    current: DataFrame, previous: DataFrame, partition_cols: list[str]
) -> DataFrame:
    """Partitions whose manifest changed between two listings: added,
    removed, or with different file count / byte size / mtime.

    Output: partition values + ``change`` ∈ {added, removed, modified}.
    Both manifests are O(partitions) rows — the full-outer join is
    metadata-scale regardless of data volume.
    """
    cur = current.select(
        *partition_cols,
        F.col("n_files").alias("cur_files"),
        F.col("total_bytes").alias("cur_bytes"),
        F.col("max_mtime").alias("cur_mtime"),
    )
    prev = previous.select(
        *partition_cols,
        F.col("n_files").alias("prev_files"),
        F.col("total_bytes").alias("prev_bytes"),
        F.col("max_mtime").alias("prev_mtime"),
    )
    joined = cur.join(prev, partition_cols, "full_outer")
    change = (
        F.when(F.col("prev_files").isNull(), F.lit("added"))
        .when(F.col("cur_files").isNull(), F.lit("removed"))
        .when(
            (F.col("cur_files") != F.col("prev_files"))
            | (F.col("cur_bytes") != F.col("prev_bytes"))
            | (F.col("cur_mtime") != F.col("prev_mtime")),
            F.lit("modified"),
        )
        .otherwise(F.lit(None))
        .alias("change")
    )
    return joined.select(*partition_cols, change).where(F.col("change").isNotNull())


def _unescape_path_value(value: str) -> str:
    """Invert Hive/Spark partition-path escaping: ``%XX`` hex sequences
    back to their characters (``zone=a%3Db`` on disk is value ``a=b``).

    Only percent-escapes are decoded — unlike ``url_decode`` this never
    turns a literal ``+`` into a space (Hive does not form-encode)."""
    out, i, n = [], 0, len(value)
    while i < n:
        c = value[i]
        if c == "%" and i + 3 <= n:
            try:
                out.append(chr(int(value[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(c)
        i += 1
    return "".join(out)


def changed_partition_filter(
    changed: DataFrame, partition_cols: list[str]
) -> F.Column | None:
    """Build the pruning predicate for the changed partitions.

    The changed set is O(partitions) metadata — collecting it to drive
    partition pruning is the standard incremental-pipeline shape (the
    predicate must be a plan literal for ``PartitionFilters`` to prune
    directories at planning time). Manifest values are raw path
    segments; they are Hive-unescaped here so they compare against the
    ACTUAL column values the scan materializes. Returns ``None`` when
    nothing changed (callers skip the scan entirely).

    NULL partition values are matched null-safely: Hive writes them as
    ``k=__HIVE_DEFAULT_PARTITION__`` directories, so the column side is
    coalesced to that sentinel before keying — ``concat_ws`` would
    otherwise silently DROP a NULL element, so a changed default
    partition could never match its manifest tuple (silently excluded
    from the rescan) and multi-column NULLs could collide
    (``(NULL,'x')`` and ``('x',NULL)`` both keying to ``'x'``).
    """
    sentinel = "__HIVE_DEFAULT_PARTITION__"
    rows = changed.select(*partition_cols).distinct().collect()
    if not rows:
        return None
    tuples = [
        tuple(
            sentinel if r[c] is None else _unescape_path_value(str(r[c]))
            for c in partition_cols
        )
        for r in rows
    ]
    key = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(sentinel))
            for c in partition_cols
        ],
    )
    return key.isin(["\x1f".join(t) for t in tuples])


def incremental_count_reconcile(
    spark: SparkSession,
    src_dir: str,
    tgt_dir: str,
    table: str,
    partition_cols: list[str],
    prev_src_manifest: DataFrame | None = None,
    prev_tgt_manifest: DataFrame | None = None,
) -> tuple[DataFrame | None, DataFrame, DataFrame]:
    """UC#1 count reconciliation restricted to changed partitions.

    Returns ``(reconciled | None, src_manifest, tgt_manifest)`` — the
    caller persists the manifests as the next run's state. A partition
    is re-scanned when EITHER side's (file count, bytes, mtime) changed
    since its saved manifest — the rsync-style quick check; unchanged
    metadata on both sides implies the previous verdict still holds.
    ``reconciled`` is ``None`` when no partition changed. With no prior
    state (first run) both sides are scanned in full — manifests cannot
    prove cross-side data equality (equal byte lengths ≠ equal rows),
    only same-side non-change.
    """
    from hive_scripts_spark.operators.reconcile import (
        count_reconcile,
        partition_counts,
    )

    src_mf = file_manifest(spark, f"{src_dir}/{table}", partition_cols)
    tgt_mf = file_manifest(spark, f"{tgt_dir}/{table}", partition_cols)
    pred = None
    if prev_src_manifest is not None and prev_tgt_manifest is not None:
        changed = manifest_diff(
            src_mf, prev_src_manifest, partition_cols
        ).unionByName(manifest_diff(tgt_mf, prev_tgt_manifest, partition_cols))
        pred = changed_partition_filter(changed, partition_cols)
        if pred is None:
            return None, src_mf, tgt_mf

    src = spark.read.parquet(f"{src_dir}/{table}")
    tgt = spark.read.parquet(f"{tgt_dir}/{table}")
    if pred is not None:
        src, tgt = src.where(pred), tgt.where(pred)
    reconciled = count_reconcile(
        partition_counts(src, partition_cols, table),
        partition_counts(tgt, partition_cols, table),
    )
    return reconciled, src_mf, tgt_mf


def incremental_fingerprint_reconcile(
    spark: SparkSession,
    src_dir: str,
    tgt_dir: str,
    table: str,
    partition_cols: list[str],
    key_cols: list[str],
    prev_src_manifest: DataFrame | None = None,
    prev_tgt_manifest: DataFrame | None = None,
    fraction: float = 0.10,
) -> tuple[DataFrame | None, DataFrame, DataFrame]:
    """UC#2 (sampled-content fingerprints) restricted to changed
    partitions — same manifest machinery as
    :func:`incremental_count_reconcile`, same return contract.

    The deterministic hash-mod sample means the *same logical rows* are
    re-fingerprinted on both sides of each changed partition, so an
    incremental verdict is directly comparable with the full run's.
    """
    from hive_scripts_spark.operators.fingerprint import (
        fingerprint_reconcile,
        sampled_fingerprint,
    )

    src_mf = file_manifest(spark, f"{src_dir}/{table}", partition_cols)
    tgt_mf = file_manifest(spark, f"{tgt_dir}/{table}", partition_cols)
    pred = None
    if prev_src_manifest is not None and prev_tgt_manifest is not None:
        changed = manifest_diff(
            src_mf, prev_src_manifest, partition_cols
        ).unionByName(manifest_diff(tgt_mf, prev_tgt_manifest, partition_cols))
        pred = changed_partition_filter(changed, partition_cols)
        if pred is None:
            return None, src_mf, tgt_mf

    src = spark.read.parquet(f"{src_dir}/{table}")
    tgt = spark.read.parquet(f"{tgt_dir}/{table}")
    if pred is not None:
        src, tgt = src.where(pred), tgt.where(pred)
    reconciled = fingerprint_reconcile(
        sampled_fingerprint(src, key_cols, table, partition_cols, fraction),
        sampled_fingerprint(tgt, key_cols, table, partition_cols, fraction),
    )
    return reconciled, src_mf, tgt_mf


def small_file_report(
    manifest: DataFrame, min_avg_bytes: int = 32 * 1024 * 1024
) -> DataFrame:
    """Partitions whose mean file size is below ``min_avg_bytes`` — the
    small-files pathology report (every streaming/incremental writer
    accumulates it; at 100 TB it quietly multiplies task counts and
    NameNode/listing pressure). Input is a :func:`file_manifest` frame;
    output adds ``avg_bytes`` and keeps only offenders."""
    return (
        manifest.withColumn(
            "avg_bytes", (F.col("total_bytes") / F.col("n_files")).cast("long")
        )
        .where((F.col("n_files") > 1) & (F.col("avg_bytes") < min_avg_bytes))
    )


def compact_partition_dir(
    spark: SparkSession, partition_dir: str, target_files: int = 1
) -> int:
    """Rewrite one partition directory into ``target_files`` parquet
    files. Returns the file count before compaction.

    Local/HDFS semantics: writes to a ``_compact_tmp`` sibling then
    swaps via two sequential renames. The swap is NOT atomic for
    concurrent readers — between the two renames the directory briefly
    does not exist (ENOENT), so run it in a maintenance window or under
    a table format's commit protocol. It IS crash-recoverable: a run
    that died between the renames leaves the complete data in
    ``_compact_old`` (and/or ``_compact_tmp``), and the next invocation
    restores the live directory before compacting. (On S3 a rename is a
    copy; use a table format's commit there instead — documented
    limitation, not silently unsafe.) Driver-side work is O(1) renames;
    the data move is one distributed ``coalesce`` write, no shuffle.
    """
    import shutil
    from pathlib import Path

    src = Path(partition_dir)
    tmp = src.with_name(src.name + "_compact_tmp")
    old = src.with_name(src.name + "_compact_old")
    # crash recovery from a previous interrupted swap: the old directory
    # is always complete data — restore it as live if live is missing;
    # stale tmp/old leftovers are discarded either way.
    if old.exists():
        if src.exists():
            shutil.rmtree(old)
        else:
            old.rename(src)
    if tmp.exists():
        shutil.rmtree(tmp)

    df = spark.read.parquet(str(src))
    n_before = len(list(src.glob("*.parquet")))
    df.coalesce(target_files).write.mode("overwrite").parquet(str(tmp))
    src.rename(old)
    tmp.rename(src)
    shutil.rmtree(old)
    return n_before


def merge_upsert(
    current: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    order_col: str | None = None,
    delete_col: str | None = None,
) -> DataFrame:
    """Batch MERGE (upsert, latest-wins) without a table format — the
    recrawl-refresh step of a corpus pipeline: today's crawl delta
    replaces yesterday's version of the same key (URL / doc_id), new
    keys insert, and rows the delta flags via ``delete_col`` drop.

    Semantics: for each key, the surviving row is the CHANGES row when
    the key appears in changes, else the CURRENT row; among several
    changes rows for one key the one with the greatest ``order_col``
    wins. Remaining ties (and the no-``order_col`` multi-version case)
    break on a hash of the full row — deterministic across runs and
    engines given identical data, so a delta that should have carried
    an ``order_col`` degrades reproducibly rather than randomly.
    ``delete_col`` (boolean column on changes) marks tombstones: the
    key's current row is suppressed and no new row lands.

    Scale shape: ONE exchange — union the two sides with a provenance
    flag, one ``row_number`` window over the key — no join (a join
    form would shuffle both sides anyway and then shuffle again for
    multi-version dedup). Output column order follows ``current``.
    At 100 TB the delta is typically ≪ the corpus; the exchange is
    still corpus-sized, which is what table formats avoid with file
    pruning — documented trade: this operator is the format-free
    fallback, correct on plain parquet anywhere.
    """
    from pyspark.sql import Window

    if delete_col is not None and delete_col not in changes.columns:
        raise ValueError(f"changes has no delete column {delete_col!r}")
    out_cols = list(current.columns)
    bad_keys = [k for k in key_cols if k not in out_cols]
    if bad_keys:
        raise ValueError(
            f"key columns {bad_keys} not in current's columns {out_cols}"
        )
    if order_col is not None and order_col not in out_cols:
        # the window orders the UNION, so the version column must
        # exist on current too (a delta-only crawl_ts would be dropped
        # by the projection and die in an opaque AnalysisException) —
        # a corpus without one adds a constant/epoch column first
        raise ValueError(
            f"order_col {order_col!r} must be a column of current "
            "(the latest-wins window orders the union of both sides)"
        )
    missing = [c for c in out_cols if c not in changes.columns]
    if missing:
        # a partial delta (keys + changed columns only) is the likely
        # misuse — fail with the column list, not a deep
        # AnalysisException from the select below
        raise ValueError(
            "changes must carry every column of current; missing: "
            f"{missing} (project the unchanged columns in, or join the "
            "delta against current first)"
        )
    cur = current.select(
        *out_cols,
        F.lit(0).alias("__is_change"),
        F.lit(False).alias("__del"),
    )
    chg = changes.select(
        *out_cols,
        F.lit(1).alias("__is_change"),
        (
            F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
            if delete_col is not None
            else F.lit(False)
        ).alias("__del"),
    )
    order = [F.col("__is_change").desc()]
    if order_col is not None:
        order.append(F.col(order_col).desc_nulls_last())
    # final tiebreak: full-row hash INCLUDING the tombstone flag —
    # reproducible survivor selection even when several equal-order
    # versions of one key collide (a delete + re-insert of identical
    # data would otherwise tie on every sort key and flip per shuffle)
    order.append(
        F.xxhash64(*[F.col(c) for c in out_cols], F.col("__del")).desc()
    )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    ranked = cur.unionByName(chg).withColumn(
        "__rn", F.row_number().over(w)
    )
    return ranked.where(
        (F.col("__rn") == 1) & ~F.col("__del")
    ).select(*out_cols)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: apply a batch of attribute
    changes to a history-keeping dimension, closing superseded
    versions instead of overwriting them (the metadata side of a
    training corpus — source catalogs, license states, crawl configs —
    where "what did we believe at training time?" must stay
    answerable).

    ``dim`` carries (key_cols, attrs..., valid_from, valid_to) with
    ``valid_to IS NULL`` marking each key's current version;
    ``changes`` carries (key_cols, attrs..., ts_col). Output:

    * historical (closed) dim rows pass through untouched;
    * a current dim row whose key receives changes closes at the
      FIRST incoming change's timestamp;
    * each change row becomes a version valid from its ``ts_col``
      until the key's next change (NULL for the newest — multiple
      changes for one key in one batch chain correctly; equal-``ts``
      changes for one key tie-break on an attribute hash, so a
      degenerate batch degrades reproducibly, not randomly);
    * keys without changes keep their open row; brand-new keys insert
      open-ended chains.

    Precondition (documented, and clamped rather than corrupted):
    changes must not PREdate the key's open row — SCD2 ``apply`` is an
    append operation, and a late-arriving change belongs in a history
    REBUILD, not an apply. If it happens anyway, the open row closes
    at its own ``valid_from`` (a zero-length version — visible in the
    output) instead of producing an inverted ``valid_to < valid_from``
    interval that point-in-time queries would silently drop.

    Scale shape: one window over (key, ts) sequences the incoming
    changes (lead = next version's start), and one window over key
    pairs the current dim row with its first successor — both ride
    the SAME key-partitioned exchange; historical rows never shuffle
    (they filter out before the union and re-enter with a cheap
    unionByName). No join against the change stream per row.
    """
    from pyspark.sql import Window

    attr_cols = [
        c for c in dim.columns
        if c not in (*key_cols, valid_from, valid_to)
    ]
    for c in (*key_cols, *attr_cols, ts_col):
        if c not in changes.columns:
            raise ValueError(f"changes is missing column {c!r}")

    closed = dim.where(F.col(valid_to).isNotNull())
    open_rows = dim.where(F.col(valid_to).isNull())

    # union FIRST, sequence AFTER: running the lead window on the
    # changes branch before the union made Catalyst shuffle the
    # changes TWICE (once for lead on key, once more because the
    # union's dim branch voids the partitioning guarantee before the
    # min window — the r16 plan audit caught two exchanges where the
    # contract below promises one). Ordering by __src puts the single
    # open dim row FIRST within its key, so a change row's lead is
    # always the next CHANGE (or NULL for the newest) — the dim row
    # can never become a lead target — and both windows now share one
    # hashpartitioning(key) exchange.
    stacked = open_rows.select(
        *key_cols, *attr_cols, valid_from, valid_to,
        F.lit(0).alias("__src"),
    ).unionByName(
        changes.select(
            *key_cols,
            *attr_cols,
            F.col(ts_col).alias(valid_from),
            F.lit(None).cast(dict(dim.dtypes)[valid_to]).alias(valid_to),
            F.lit(1).alias("__src"),
        )
    )
    # sequence the incoming versions per key: each runs until the next.
    # The attr-hash tiebreak makes equal-ts batches reproducible (the
    # merge_upsert degradation contract).
    next_version = F.lead(valid_from).over(
        Window.partitionBy(*key_cols).orderBy(
            F.col("__src"),
            F.col(valid_from),
            F.xxhash64(*[F.col(c) for c in attr_cols]),
        )
    )
    stacked = stacked.withColumn(
        valid_to,
        F.when(F.col("__src") == 1, next_version).otherwise(
            F.col(valid_to)
        ),
    )

    # close each key's open row at its first incoming change (keys
    # with no change keep valid_to NULL via the min-over-empty = NULL)
    first_change = F.min(
        F.when(F.col("__src") == 1, F.col(valid_from))
    ).over(Window.partitionBy(*key_cols))
    # clamp: a late-arriving change (ts before the open row's
    # valid_from) must not invert the interval — see docstring. The
    # isNotNull guard matters: Spark's greatest() SKIPS nulls, so an
    # unguarded clamp would close untouched open rows (first_change
    # NULL) at their own valid_from.
    close_at = F.when(
        first_change.isNotNull(),
        F.greatest(first_change, F.col(valid_from)),
    )
    adjusted = stacked.withColumn(
        valid_to,
        F.when(F.col("__src") == 0, close_at).otherwise(F.col(valid_to)),
    ).select(*key_cols, *attr_cols, valid_from, valid_to)

    return closed.select(
        *key_cols, *attr_cols, valid_from, valid_to
    ).unionByName(adjusted)
