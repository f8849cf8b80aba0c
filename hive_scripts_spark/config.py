"""INI-style job-config loader.

Reproduces the semantics of the reference's sed-based section slicing over
``configuration.properties`` (``verizon_automation_script.sh:39-85``):

* sections are delimited by ``[Name]`` header lines; a section's body runs
  until the *next* section header (the reference slices
  ``sed '/Source/,/Target/!d;/Target/q' | sed '1d;$d'``, i.e. substring
  match on the header names, body = lines strictly between headers);
* key/value lines split on the **first** ``:`` only
  (``cut -d: -f1`` / ``-f2`` — ``verizon_automation_script.sh:42-43``);
* bare lines (no ``:``) are list items (the ``[Tables]`` section,
  ``configuration.properties:10-15``);
* CRLF line endings are tolerated (the reference file ships ``\r\n`` and
  the scripts strip ``\r`` downstream at ``:164-165``);
* the quirk that ``[SampleDataPercentage]`` holds an absolute row count,
  not a percentage (``configuration.properties:16-17`` vs the ``LIMIT``
  use at ``verizon_automation_script.sh:220``), is surfaced here as
  ``sample_size`` with an explicit ``sample_mode``.

Pure Python — no Spark involvement (SURVEY §2.1/S3).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from pathlib import Path

_SECTION_RE = re.compile(r"^\[(?P<name>[^\]]+)\]\s*$")


def parse_sections(text: str) -> dict[str, list[str]]:
    """Split INI-ish text into ``{section_name: [body lines]}``.

    Body lines are stripped of surrounding whitespace and ``\\r``; blank
    lines are dropped (the reference's ``for line in $data`` word-splitting
    ignores them).
    """
    sections: dict[str, list[str]] = {}
    current: list[str] | None = None
    # split on \n only (not str.splitlines(), which also splits on \x1c-\x1e,
    # \x85,  … — the reference's sed pipeline treats those as content)
    for raw in text.split("\n"):
        line = raw.strip().rstrip("\r").strip()
        if not line:
            continue
        m = _SECTION_RE.match(line)
        if m:
            current = sections.setdefault(m.group("name"), [])
        elif current is not None:
            current.append(line)
    return sections


def split_kv(line: str) -> tuple[str, str]:
    """Split ``key:value`` on the first colon (``cut -d: -f1/-f2``)."""
    key, sep, value = line.partition(":")
    return key.strip(), value.strip() if sep else ""


@dataclass
class EndpointConfig:
    """One side of the reconciliation (``[Source]`` / ``[Target]``)."""

    db_name: str = ""
    host: str = ""
    port: str = ""
    #: Spark-native addition: path prefix holding ``<table>.parquet`` files.
    path: str = ""

    @classmethod
    def from_lines(cls, lines: list[str]) -> "EndpointConfig":
        cfg = cls()
        for line in lines:
            key, value = split_kv(line)
            if key == "DBName":
                cfg.db_name = value
            elif key == "Host":
                cfg.host = value
            elif key == "Port":
                cfg.port = value
            elif key == "Path":
                cfg.path = value
        return cfg


@dataclass
class JobConfig:
    """Full job config: two endpoints, a table list, and sampling knobs."""

    source: EndpointConfig = field(default_factory=EndpointConfig)
    target: EndpointConfig = field(default_factory=EndpointConfig)
    tables: list[str] = field(default_factory=list)
    #: the reference's "[SampleDataPercentage]" value — used there as an
    #: absolute ``LIMIT`` row count, never a percentage (SURVEY §2.8.1).
    #: Interpretation depends on ``sample_mode``: 'rows' keeps the
    #: reference's absolute-count semantics; 'hash' reads it as the
    #: percentage the key name claims (capped at 100), since a hash-mod
    #: sample is a fraction, not a row count.
    sample_size: int = 10
    #: 'rows'  → reference-literal ``LIMIT n`` behavior (ordered on the
    #:           sampling keys for cross-engine determinism);
    #: 'hash'  → deterministic hash-mod sampling (default: cross-engine
    #:           comparable, unlike LIMIT-without-ORDER-BY).
    sample_mode: str = "hash"

    @classmethod
    def from_text(cls, text: str) -> "JobConfig":
        sections = parse_sections(text)
        cfg = cls(
            source=EndpointConfig.from_lines(sections.get("Source", [])),
            target=EndpointConfig.from_lines(sections.get("Target", [])),
            tables=[t for line in sections.get("Tables", []) for t in line.split()],
        )
        sample = sections.get("SampleDataPercentage", [])
        if sample:
            cfg.sample_size = int(sample[0])
        mode = sections.get("SampleMode", [])
        if mode:
            cfg.sample_mode = mode[0]
        return cfg

    @classmethod
    def from_file(cls, path: str | Path) -> "JobConfig":
        return cls.from_text(Path(path).read_text())
