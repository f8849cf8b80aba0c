"""Config-loader unit tests (SURVEY §5.3): INI-section slicing semantics of
``verizon_automation_script.sh:39-85`` — section bodies between headers,
first-colon key/value split, CRLF tolerance, word-split table lists."""

from hive_scripts_spark.config import EndpointConfig, JobConfig, parse_sections, split_kv

# structurally equivalent to the reference's configuration.properties
# (sections/keys/shape), with local values and CRLF endings
GOLDEN = (
    "[Source]\r\n"
    "DBName:src_db\r\n"
    "Host:10.0.0.1\r\n"
    "Port:10001\r\n"
    "[Target]\r\n"
    "DBName:tgt_db\r\n"
    "Host:10.0.0.2\r\n"
    "Port:10002\r\n"
    "[Tables]\r\n"
    "emp\r\n"
    "dept\r\n"
    "salary\r\n"
    "student\r\n"
    "course\r\n"
    "marks\r\n"
    "[SampleDataPercentage]\r\n"
    "10\r\n"
    "[END]\r\n"
)


def test_sections_sliced_between_headers():
    sections = parse_sections(GOLDEN)
    assert sections["Source"] == ["DBName:src_db", "Host:10.0.0.1", "Port:10001"]
    assert sections["Tables"] == ["emp", "dept", "salary", "student", "course", "marks"]
    assert sections["SampleDataPercentage"] == ["10"]
    assert sections["END"] == []


def test_split_kv_first_colon_only():
    # cut -d: -f1/-f2 splits on the FIRST colon
    assert split_kv("Host:10.0.0.1") == ("Host", "10.0.0.1")
    assert split_kv("nocolonhere") == ("nocolonhere", "")
    key, value = split_kv("Path:/data:archive")
    assert key == "Path" and value == "/data:archive"


def test_job_config_end_to_end():
    cfg = JobConfig.from_text(GOLDEN)
    assert cfg.source.db_name == "src_db"
    assert cfg.target.host == "10.0.0.2"
    assert cfg.tables == ["emp", "dept", "salary", "student", "course", "marks"]
    # the "percentage" that is actually a row count (SURVEY §2.8.1)
    assert cfg.sample_size == 10
    assert cfg.sample_mode == "hash"


def test_missing_sections_default():
    cfg = JobConfig.from_text("[Source]\nDBName:only\n")
    assert cfg.source.db_name == "only"
    assert cfg.tables == []
    assert cfg.sample_size == 10


def test_endpoint_path_extension():
    ep = EndpointConfig.from_lines(["DBName:x", "Path:/data/lake/source"])
    assert ep.path == "/data/lake/source"
