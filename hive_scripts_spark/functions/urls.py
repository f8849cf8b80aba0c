"""URL scalar functions — the canonicalization layer crawl dedup keys
on (LLM-pipeline extension surface; the reference has no URL concept).

The crawl-refresh chain: two fetches of "the same page" usually differ
only in URL noise — scheme/host case, default ports, fragments, query
parameter order, tracking parameters. Keying ``merge_upsert`` /
``dedup_exact`` on the RAW url misses those duplicates entirely, so
canonicalization is a correctness lever for corpus dedup, not
cosmetics.

Everything here is pure Spark column expressions (regexp + array HOFs
— JVM-side, zero Python in the hot path; the HOF lambdas opt out of
whole-stage fusion but the plan stays one Project over the scan), so
a 100 TB URL column canonicalizes map-only with no shuffle and no
Arrow transfer. The transforms, in order:

* scheme and host lowercase; userinfo (``user:pass@``) dropped;
* trailing-dot host normalized (``example.org.`` → ``example.org``);
* default ports dropped (``:80`` for http, ``:443`` for https);
* fragment dropped;
* query string: parameters split, tracking params dropped (``utm_*``
  and the usual click-id set), the rest SORTED (param order is
  transport noise) and rejoined; an emptied query drops its ``?``;
* trailing path ``/`` dropped (except the bare root, which becomes
  the empty path — ``https://x/`` and ``https://x`` collide, by
  design).

Deliberately NOT done (each changes semantics for some sites, so they
are opt-in judgment calls a caller can layer on top): www-stripping,
path case-folding, percent-decoding, session-id params beyond the
fixed tracking list.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that identify the CLICK, not the content — the
#: standard strip set for crawl dedup (all public ad/analytics ids)
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "utm_id", "gclid", "fbclid", "msclkid", "dclid",
    "mc_cid", "mc_eid", "igshid", "ref_src",
)

_URL_RE = (
    r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"   # 1 scheme
    r"(?:[^/?#@]*@)?"                   # userinfo (dropped)
    r"(\[[^\]/?#]*\]|[^/?#:]*)"         # 2 host ([IPv6] or reg-name)
    r"(?::([0-9]+))?"                   # 3 port
    r"([^?#]*)"                         # 4 path
    r"(?:\?([^#]*))?"                   # 5 query
    r"(?:#.*)?$"                        # fragment (dropped)
)


def _clean_query(query: Column) -> Column:
    """Split, strip tracking params, sort, rejoin; '' when emptied."""
    parts = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.lower(p).rlike(
            "^(?:" + "|".join(TRACKING_PARAMS) + ")(?:=|$)"
        ),
    )
    return F.array_join(F.array_sort(parts), "&")


def normalize_host(col: Column | str) -> Column:
    """The host EQUALITY form — lowercased, one trailing dot stripped.
    Every consumer that compares or joins hosts must use this one
    expression (url_host, canonical_url, and the robots politeness
    join all route through it), so the normalization can never diverge
    between join sides."""
    h = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(h, r"\.$", ""))


def canonical_url(col: Column | str) -> Column:
    """The canonical form of an absolute URL (see module docstring);
    NULL in, NULL out; a string that does not parse as an absolute URL
    canonicalizes to itself (degrade, never fail — relative links and
    garbage pass through for the caller to filter)."""
    url = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(url, _URL_RE, 1))
    host = normalize_host(F.regexp_extract(url, _URL_RE, 2))
    port = F.regexp_extract(url, _URL_RE, 3)
    path = F.regexp_extract(url, _URL_RE, 4)
    query = F.coalesce(F.regexp_extract(url, _URL_RE, 5), F.lit(""))

    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))

    # trailing slash drops ('/a/b/' == '/a/b'; bare '/' == '')
    path_part = F.regexp_replace(path, r"/+$", "")

    clean_q = _clean_query(query)
    query_part = F.when(clean_q == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), clean_q)
    )

    rebuilt = F.concat(
        scheme, F.lit("://"), host, port_part, path_part, query_part
    )
    # not an absolute URL -> pass through unchanged
    return F.when(scheme == "", url).otherwise(rebuilt)


def url_host(col: Column | str) -> Column:
    """Normalized host of an absolute URL ('' for non-URLs)."""
    url = F.col(col) if isinstance(col, str) else col
    return normalize_host(F.regexp_extract(url, _URL_RE, 2))


#: two-level public suffixes where the registrable domain is the THIRD
#: label from the right (a pragmatic literal subset of the public
#: suffix list — the full PSL is a data file, not an algorithm; callers
#: with PSL needs join a suffix table instead)
_TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au",
    "org.au", "co.jp", "ne.jp", "or.jp", "com.br", "com.cn",
    "com.mx", "co.in", "co.kr", "co.nz", "com.sg", "com.tr",
)


def url_registered_domain(col: Column | str) -> Column:
    """The registrable domain (eTLD+1 approximation): last two host
    labels, or last THREE when the last two are a known two-level
    public suffix (``a.b.co.uk`` → ``b.co.uk``). IP-literal hosts
    (IPv4 dotted quads, bracketed IPv6) have no registrable domain —
    they return whole, one quota bucket per address, not per last-two
    octets. Per-host grouping key for crawl politeness / per-site
    quotas."""
    host = url_host(col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    two_level = last2.isin(*_TWO_LEVEL_SUFFIXES)
    ip_literal = host.rlike(r"^(\d{1,3}\.){3}\d{1,3}$") | host.startswith(
        "["
    )
    return (
        F.when(ip_literal | (n <= 2), host)
        .when(two_level & (n >= 3), F.array_join(F.slice(labels, n - 2, 3), "."))
        .otherwise(last2)
    )
