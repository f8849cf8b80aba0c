"""Mojibake repair — UTF-8 read as cp1252/Latin-1, undone
(LLM-pipeline extension surface; the reference has no encoding
concept — its fixed-width exports are ASCII by contract,
``verizon_automation_script.sh:90-130``).

Web crawls are full of text that was UTF-8 on the wire but decoded
with a legacy single-byte codec somewhere in the publishing chain:
``é`` (UTF-8 ``C3 A9``) surfaces as ``Ã©``, ``—`` (``E2 80 94``) as
``â€"``, and double-mangled pages stack the damage (``Ã©`` →
``ÃƒÂ©``). Left in, these strings poison dedup keys (the clean and
mangled copies of a page stop colliding), inflate token counts, and
teach the model garbage codepoints — so crawl pipelines run an
ftfy-style fixer right after HTML extraction (the ``ftfy`` tool is
the public reference for the approach; this is a stdlib-only
re-derivation of its core UTF-8/cp1252 case, not a port).

The repair is the inverse transform: re-encode the text with cp1252
(Latin-1 as fallback for the five cp1252 holes), re-decode as UTF-8,
and ACCEPT the result only when it strictly reduces a mojibake
badness score — the count of lead-byte/continuation-byte character
pairs (``Â``–``ô`` followed by a codepoint that cp1252/Latin-1 maps a
UTF-8 continuation byte to) that essentially never occur in clean
text but always occur in mangled UTF-8. Up to ``max_passes`` rounds
unstack double-encoding. Mixed documents repair SEGMENT-WISE (like
ftfy): characters outside the cp1252/latin-1 alphabet (CJK, emoji —
text that cannot BE mojibake) pass through verbatim and split the
string into independently-repaired runs, so an emoji beside mangled
text never blocks its repair; a run that fails to encode, fails to
decode as UTF-8, or doesn't strictly improve is returned unchanged.
Degrade, never damage: the accept-only-if-better rule (applied per
run) makes the operator idempotent and safe to run on already-clean
corpora.

Scale posture: a pure per-row string transform behind ONE Arrow-
batched ``pandas_udf`` projection — zero shuffle, zero join at any
corpus size; the fast path (clean text) is a single regex scan that
bails before any codec work. Chain:
``warc_ingest_documents`` → ``html_to_text`` → ``fix_mojibake`` →
dedup/quality/decontamination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_fix_fn():
    """Return the pure ``(text, max_passes) -> text`` fixer as a
    NESTED function (captured by value in worker closures — the
    off-repo-driver rule; tests exercise the exact code executors
    run)."""
    import re

    # a mojibake "suspicion pair": the cp1252/Latin-1 decoding of a
    # UTF-8 LEAD byte (C2-F4 -> Â..ô) immediately followed by the
    # decoding of a CONTINUATION byte (80-BF): as Latin-1 those are
    # U+0080-U+00BF verbatim; as cp1252, bytes 80-9F land on the
    # punctuation/letter set spelled out below (the five cp1252 holes
    # 81 8D 8F 90 9D pass through as C1 controls, already covered by
    # the U+0080-U+009F span).
    bad = re.compile(
        # lead: cp1252/latin-1 view of UTF-8 lead bytes C2-F4
        "[\u00c2-\u00f4]"
        "["
        # latin-1 view of continuation bytes 80-BF (includes the five
        # cp1252 holes 81 8D 8F 90 9D, which pass through as C1)
        "\u0080-\u00bf"
        # cp1252 view of continuation bytes 80-9F
        "\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6"
        "\u2030\u0160\u2039\u0152\u017d\u2018\u2019\u201c"
        "\u201d\u2022\u2013\u2014\u02dc\u2122\u0161\u203a"
        "\u0153\u017e\u0178"
        "]"
    )

    def badness(s: str) -> int:
        return len(bad.findall(s))

    # WHATWG-style windows-1252 reverse map: Python's strict cp1252
    # codec REFUSES the five hole bytes (81 8D 8F 90 9D), but the web
    # decodes them to the C1 controls (HTML5 windows-1252), and real
    # mojibake mixes holes with cp1252 punctuation in one string
    # ('â€\\x9d' for '”') — so the re-encode uses this 256-entry map,
    # holes included, with plain latin-1 as the fallback for strings
    # mangled by a pure latin-1 decoder (C1 codepoints where cp1252
    # has printable punctuation).
    rev = {}
    for b_ in range(256):
        try:
            ch = bytes([b_]).decode("cp1252")
        except UnicodeDecodeError:
            ch = chr(b_)  # the five holes pass through as C1
        rev[ch] = b_

    # maximal runs of RE-ENCODABLE characters: the latin-1 range plus
    # the 27 cp1252 punctuation/letter decodings of bytes 80-9F —
    # exactly rev's key set unioned with latin-1. Mixed documents
    # (emoji or CJK beside mangled text — common in crawls) are
    # repaired per run (r15 ADVICE; ftfy, the public reference,
    # repairs segment-wise too): a character that cannot BE mojibake
    # never blocks the repair of the mangled text around it, and it
    # can never sit inside a mangled byte sequence (every mojibake
    # char is in this class), so run boundaries cannot split one.
    encodable_run = re.compile(
        "[\\x00-\\xff"
        + "".join(sorted(c for c in rev if ord(c) > 0xFF))
        + "]+"
    )

    def fix_run(seg: str, max_passes: int) -> str:
        for _ in range(max_passes):
            score = badness(seg)
            if score == 0:
                return seg
            try:
                raw = bytes(rev[c] for c in seg)
            except KeyError:
                # a C1 control (latin-1 mangling) and a cp1252
                # punctuation char in ONE run means two different
                # decoders touched the same span — ambiguous, keep it
                try:
                    raw = seg.encode("latin-1")
                except UnicodeEncodeError:
                    return seg
            try:
                cand = raw.decode("utf-8")
            except UnicodeDecodeError:
                return seg  # suspicious-looking but not valid UTF-8
            if badness(cand) >= score:
                return seg  # no strict improvement -> keep original
            seg = cand
        return seg

    def fix_text(s, max_passes: int = 3):
        if not isinstance(s, str):
            return s  # None (and pandas NaN inside the UDF) pass through
        if not badness(s):
            return s  # fast path: clean text costs one regex scan
        parts = []
        pos = 0
        for m in encodable_run.finditer(s):
            parts.append(s[pos : m.start()])
            parts.append(fix_run(m.group(), max_passes))
            pos = m.end()
        parts.append(s[pos:])
        return "".join(parts)

    return fix_text


def fix_mojibake_col(
    col: Column | str, max_passes: int = 3
) -> Column:
    """Column form: the repaired text (NULL in, NULL out). One
    Arrow-batched ``pandas_udf`` — a map-side projection, no
    shuffle."""
    from pyspark.sql.functions import pandas_udf

    fix_text = build_fix_fn()

    @pandas_udf("string")
    def fix_udf(texts):
        return texts.map(lambda s: fix_text(s, max_passes))

    return fix_udf(F.col(col) if isinstance(col, str) else col)


def fix_mojibake(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    max_passes: int = 3,
    flag_col: str | None = None,
) -> DataFrame:
    """Repair mojibake in ``text_col`` (in place by default; pass
    ``out_col`` to keep the original beside it). ``flag_col`` adds a
    boolean marking rows the repair actually changed — the audit
    column a curation report wants without a second diff pass.

    The fixed value is staged once under a temp alias and both the
    output column and the flag read THAT (the UDF runs once —
    ExtractPythonUDFs lifts it into a single ArrowEvalPython node),
    and the flag compares against the ORIGINAL column before any
    overwrite, so ``out_col=None`` cannot self-compare."""
    # collision guards (r15 review pass 2): silently clobbering an
    # existing column would destroy earlier audit data with no error —
    # only the documented in-place overwrite (out_col None / text_col)
    # is allowed to replace anything. Membership is checked
    # case-INSENSITIVELY (review pass 3): withColumn resolves names
    # case-insensitively under the spark.sql.caseSensitive=false
    # default, so an exact-match guard still lets 'Was_Mojibake'
    # clobber 'was_mojibake'.
    existing = {c.lower() for c in df.columns}
    if (
        out_col
        and out_col.lower() != text_col.lower()
        and out_col.lower() in existing
    ):
        raise ValueError(
            f"fix_mojibake: out_col {out_col!r} already exists"
        )
    if flag_col is not None:
        if flag_col.lower() in existing:
            raise ValueError(
                f"fix_mojibake: flag_col {flag_col!r} already exists"
            )
        if flag_col.lower() == (out_col or text_col).lower():
            raise ValueError(
                "fix_mojibake: flag_col and the output column must differ"
            )
    fixed = fix_mojibake_col(text_col, max_passes=max_passes)
    if flag_col is None:
        return df.withColumn(out_col or text_col, fixed)
    tmp = "__mojibake_fixed"
    if tmp in existing:
        raise ValueError(f"fix_mojibake: column {tmp!r} already exists")
    staged = df.withColumn(tmp, fixed).withColumn(
        flag_col,
        F.when(
            F.col(tmp).isNull() | F.col(text_col).isNull(), F.lit(False)
        ).otherwise(F.col(tmp) != F.col(text_col)),
    )
    return staged.withColumn(out_col or text_col, F.col(tmp)).drop(tmp)


# --------------------------------------------------------------------------
# unicode hygiene: control/invisible stripping + canonical normalization
# --------------------------------------------------------------------------

#: regex class of characters a training corpus never wants verbatim:
#: C0 controls except tab/newline (carriage returns are normalized by
#: functions.strings.normalize_whitespace; stripped here too for
#: standalone use), DEL + C1 controls, ZWSP, LRM/RLM + bidi
#: embedding/override/isolate controls, the word joiner,
#: ZWNBSP/BOM, and the soft hyphen — all invisible, all dedup-key
#: poison (two visually identical pages differing by a ZWSP stop
#: colliding). ZWNJ/ZWJ (U+200C/U+200D) are deliberately NOT here:
#: they are rendering-SEMANTIC in Persian/Indic scripts and emoji
#: sequences — see ``strip_joiners``.
#: class BODIES (no brackets — the classes below derive as
#: "[" + body + "]", so membership can never silently corrupt on a
#: bracket edit):
#:
#: latin-1-range invisibles — C0 controls minus tab/newline (VT/FF/CR
#: are handled separately: they are line-boundary-ish and CONVERT to
#: newline, never delete, because deleting a bare CR fuses
#: 'line1\\rline2' into one garbage token), DEL, C1 controls, soft
#: hyphen. These characters are ALSO the latin-1/cp1252-hole
#: decodings of UTF-8 continuation bytes, i.e. fix_mojibake's input
#: alphabet — any cleanup that runs BEFORE a repair must leave them
#: alone or it destroys repairable text (r15 review pass 4: stripping
#: U+0080/U+0094 turns the repairable mangled em dash into a bare
#: 'â' forever).
_LATIN1_BODY = (
    "\\x00-\\x08\\x0e-\\x1f\\x7f"  # C0 minus \t \n \x0b-\x0d, DEL
    "\\u0080-\\u009f"  # C1
    "\\u00ad"  # soft hyphen
)

#: invisibles OUTSIDE the latin-1/cp1252 alphabet — safe to strip even
#: before a mojibake repair (none of them can be a mangled byte; their
#: mojibake forms are multi-char sequences like 'â€‹', repaired first)
_WIDE_BODY = (
    "\\u200b"  # ZWSP
    "\\u200e-\\u200f"  # LRM/RLM
    "\\u202a-\\u202e"  # bidi embedding/override
    "\\u2060"  # word joiner
    "\\u2066-\\u2069"  # bidi isolates
    "\\ufeff"  # ZWNBSP/BOM
)

#: the joiners, separately: zero-width in Latin text (where they are
#: homoglyph-attack / dedup noise) but meaningful in Persian, Indic
#: scripts, and emoji ZWJ sequences — strip only for corpora where
#: that trade is understood. Outside the latin-1 alphabet, so safe in
#: repair_safe mode too.
_JOINER_BODY = "\\u200c\\u200d"

#: the full deletion class (tests and the idempotence property
#: reference it); VT/FF/CR are newline CONVERSIONS, not members
_STRIP_CLASS = "[" + _LATIN1_BODY + _WIDE_BODY + "]"


def strip_invisible_col(
    col: Column | str,
    strip_joiners: bool = False,
    repair_safe: bool = False,
) -> Column:
    """Remove control and invisible characters, keeping tab and
    newline; VT/FF/CR convert to newline instead of vanishing (CRLF
    collapses to one LF in the same scan, so it cannot double).
    ZWNJ/ZWJ are kept unless ``strip_joiners=True`` (they shape
    Persian/Indic rendering and emoji sequences; stripping them
    damages multilingual text).

    ``repair_safe=True`` strips ONLY the invisibles outside the
    latin-1/cp1252 alphabet (ZWSP, bidi marks, word joiner, BOM — and
    the joiners when requested) and leaves C0/C1/soft-hyphen/CR
    untouched: the pre-``fix_mojibake`` mode, because those bytes are
    the repair's input alphabet and removing them first destroys
    repairable mojibake.

    Two JVM ``regexp_replace`` scans in full mode (one in
    repair-safe) — stays inside whole-stage codegen, zero Python at
    any corpus size."""
    c = F.col(col) if isinstance(col, str) else col
    joiners = _JOINER_BODY if strip_joiners else ""
    if repair_safe:
        return F.regexp_replace(c, "[" + _WIDE_BODY + joiners + "]", "")
    out = F.regexp_replace(c, "\\r\\n|[\\x0b\\x0c\\x0d]", "\n")
    return F.regexp_replace(
        out, "[" + _LATIN1_BODY + _WIDE_BODY + joiners + "]", ""
    )


def nfc_col(col: Column | str, form: str = "NFC") -> Column:
    """Unicode-normalize a string column (``NFC``/``NFKC``/``NFD``/
    ``NFKD``). Spark SQL has no normalization builtin, so this is the
    one Arrow ``pandas_udf`` in the cleanup chain; the fast path
    (``unicodedata.is_normalized`` — true for ASCII and most web text)
    skips the rewrite per row. NULL in, NULL out.

    Why it matters for curation: composed ``é`` (U+00E9) and
    decomposed ``e``+U+0301 render identically but hash differently —
    un-normalized corpora leak near-duplicates straight through exact
    dedup and fragment token statistics."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"nfc_col: unknown normalization form {form!r}")
    from pyspark.sql.functions import pandas_udf

    def norm(s, _form=form):
        import unicodedata

        if not isinstance(s, str) or unicodedata.is_normalized(_form, s):
            return s
        return unicodedata.normalize(_form, s)

    @pandas_udf("string")
    def norm_udf(texts):
        return texts.map(norm)

    return norm_udf(F.col(col) if isinstance(col, str) else col)


def clean_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    form: str | None = "NFC",
    strip_joiners: bool = False,
) -> DataFrame:
    """The standard pretraining text-hygiene pass (the C4/OSCAR-style
    cleanup): strip control/invisible characters (JVM projection),
    then Unicode-normalize to ``form`` (``None`` skips the
    normalization UDF entirely — the whole pass is then pure
    codegen). In place by default; ``out_col`` keeps the original.
    Chain position: after :func:`fix_mojibake`, before dedup keys and
    token statistics — both stripping and normalization exist to make
    visually-identical texts byte-identical."""
    existing = {c.lower() for c in df.columns}
    if (
        out_col
        and out_col.lower() != text_col.lower()
        and out_col.lower() in existing
    ):
        raise ValueError(f"clean_text: out_col {out_col!r} already exists")
    cleaned = strip_invisible_col(text_col, strip_joiners=strip_joiners)
    if form is not None:
        cleaned = nfc_col(cleaned, form=form)
    return df.withColumn(out_col or text_col, cleaned)
