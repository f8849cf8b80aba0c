"""Delimited-text scan tests: the compare_tables.sh behavior verified in
SURVEY §3.3 — pipe-split positional fields; short rows and blank lines
yield empty strings, not NULLs."""

from hive_scripts_spark.sources.readers import read_delimited, reformat_delimited


def _write(tmp_path, content):
    p = tmp_path / "input.txt"
    p.write_text(content)
    return str(p)


def test_full_and_short_rows(spark, tmp_path):
    path = _write(tmp_path, "alpha\nbeta\nname|col1|col2\n\n")
    df = read_delimited(spark, path, sep="|", num_fields=3)
    rows = {tuple(r) for r in df.collect()}
    assert ("alpha", "", "") in rows  # 1-field row → empty strings
    assert ("name", "col1", "col2") in rows
    assert ("", "", "") in rows  # blank line


def test_reformat_space_joined(spark, tmp_path):
    path = _write(tmp_path, "a|b|c\nx\n")
    df = read_delimited(spark, path, sep="|", num_fields=3)
    out = {r["line"] for r in reformat_delimited(df).collect()}
    # echo "$var1 $var2 $var3" — always three fields, space-joined
    assert "a b c" in out
    assert "x" in out or "x  " in out  # concat_ws drops no args; empties join


def test_extra_fields_ignored(spark, tmp_path):
    path = _write(tmp_path, "a|b|c|d|e\n")
    df = read_delimited(spark, path, sep="|", num_fields=3)
    assert df.collect()[0][:3] == ("a", "b", "c")


def test_read_jsonl_parses_and_quarantines_corrupt_lines(spark, tmp_path):
    from hive_scripts_spark.sources.readers import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en"}\n'
        '{"doc_id": 2, "text": "bonjour", "lang": "fr"}\n'
        "this line is not json at all\n"
        '{"doc_id": 3, "text": null, "lang": "de"}\n'
        '{"doc_id": 4, "text": "truncated...\n'
    )
    df = read_jsonl(
        spark, str(p), schema="doc_id long, text string, lang string"
    )
    rows = {r["doc_id"]: r for r in df.collect() if r["doc_id"] is not None}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["text"] == "hello world" and rows[3]["text"] is None
    corrupt = [r for r in df.collect() if r["_corrupt_record"] is not None]
    assert len(corrupt) == 2  # the non-JSON line and the truncated one
    assert all(r["doc_id"] is None for r in corrupt)


def test_read_jsonl_declared_schema_is_single_pass(spark, tmp_path):
    """With a declared schema the plan must contain NO inference scan —
    the read is one pass (checked by schema equality without touching
    inference: a wrong-typed column still reads, as NULL)."""
    from hive_scripts_spark.sources.readers import read_jsonl

    p = tmp_path / "d.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{"a": "oops", "b": "y"}\n')
    df = read_jsonl(spark, str(p), schema="a long, b string")
    assert [f.name for f in df.schema.fields] == ["a", "b", "_corrupt_record"]
    rows = sorted(df.collect(), key=lambda r: (r["b"] or ""))
    # "oops" cannot be a long -> that LINE quarantines, not the file
    assert rows[0]["a"] == 1
    assert rows[1]["a"] is None and rows[1]["_corrupt_record"] is not None


def test_load_table_format_fallback(spark, tmp_path):
    """File-lake tables resolve by extension when no parquet exists:
    ORC and JSONL load by the same name; parquet wins when present."""
    from hive_scripts_spark.sources.readers import load_table

    rows = [(1, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "id long, s string")
    df.write.orc(str(tmp_path / "t_orc.orc"))
    df.toPandas().to_json(
        str(tmp_path / "t_jsonl.jsonl"), orient="records", lines=True
    )
    df.write.parquet(str(tmp_path / "both.parquet"))
    df.selectExpr("id + 10 as id", "s").write.orc(str(tmp_path / "both.orc"))

    got_orc = load_table(spark, str(tmp_path), "t_orc")
    assert sorted((r["id"], r["s"]) for r in got_orc.collect()) == rows
    got_jsonl = load_table(spark, str(tmp_path), "t_jsonl")
    assert sorted((r["id"], r["s"]) for r in got_jsonl.select("id", "s").collect()) == rows
    # parquet present -> parquet wins over the sibling orc
    got_both = load_table(spark, str(tmp_path), "both")
    assert sorted(r["id"] for r in got_both.collect()) == [1, 2]


def test_load_table_file_url_spellings_resolve_fallback(spark, tmp_path):
    """ADVICE r10: 'file:{abs}', 'file:/{abs}' and 'file://{abs}' must
    all get the same extension-fallback resolution as the bare path —
    the '://' remote check runs on the NORMALIZED local path — and the
    parquet read itself must use the normalized path too (Hadoop
    rejects 'file://tmp/x' — authority 'tmp' — with Wrong FS)."""
    import pandas as pd

    from hive_scripts_spark.sources.readers import load_table

    pd.DataFrame({"id": [1, 2], "s": ["a", "b"]}).to_json(
        str(tmp_path / "t.jsonl"), orient="records", lines=True
    )
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string").write.parquet(
        str(tmp_path / "tp.parquet")
    )
    spellings = (
        f"file:{tmp_path}",        # file:/abs (tmp_path is absolute)
        f"file:/{tmp_path}",       # file://abs -> empty authority? no: //+abs
        f"file://{tmp_path}",      # file:///abs
        f"file://localhost{tmp_path}",  # RFC 8089 localhost authority
    )
    for url in spellings:
        got = load_table(spark, url, "t")
        assert sorted(r["id"] for r in got.select("id").collect()) == [1, 2], url
        gotp = load_table(spark, url, "tp")  # parquet via the SAME url
        assert sorted(r["id"] for r in gotp.collect()) == [1, 2], url


def test_load_table_ambiguous_authority_requires_full_table(spark, tmp_path):
    """ADVICE r11: the 'file://<auth>/...' concatenation repair fires
    ONLY when the full candidate table exists at /<auth>/<path> — a
    merely existing directory prefix must not silently redirect a
    remote-looking URI to the local filesystem; absent the table it
    raises a spelled-out error instead of Hadoop's opaque Wrong FS."""
    import pytest

    from hive_scripts_spark.sources.readers import load_table

    spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string").write.parquet(
        str(tmp_path / "t.parquet")
    )
    # the genuinely ambiguous spelling: 'file://' + path minus its
    # leading slash, so the first segment parses as an authority
    # ('file://tmp/pytest-…'); the table exists at the concatenated
    # local path -> repair reads it
    url = "file://" + str(tmp_path).lstrip("/")
    got = load_table(spark, url, "t")
    assert sorted(r["id"] for r in got.collect()) == [1, 2]
    # same spelling, table absent -> explicit ValueError, no silent
    # local probe and no Wrong FS fallback
    with pytest.raises(ValueError, match="ambiguous file URI"):
        load_table(spark, url, "missing_table")
    # a clearly remote authority (no such local dir at all) also raises
    with pytest.raises(ValueError, match="ambiguous file URI"):
        load_table(spark, "file://nas-host/exports/lake", "t")


def test_load_table_csv_declared_schema_single_pass(spark, tmp_path):
    """CSV fallback with a declared schema: no inferSchema second
    scan, and types are exactly as declared (a leading-zero code
    stays a string instead of inferring to int)."""
    from hive_scripts_spark.sources.readers import load_table

    (tmp_path / "t.csv").write_text("id,code\n1,007\n2,042\n")
    got = load_table(spark, str(tmp_path), "t", csv_schema="id long, code string")
    assert dict(got.dtypes) == {"id": "bigint", "code": "string"}
    assert sorted((r["id"], r["code"]) for r in got.collect()) == [
        (1, "007"),
        (2, "042"),
    ]
    # without a schema the inference path still loads (report-table mode)
    inferred = load_table(spark, str(tmp_path), "t")
    assert sorted(r["id"] for r in inferred.collect()) == [1, 2]
