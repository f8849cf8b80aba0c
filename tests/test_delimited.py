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
