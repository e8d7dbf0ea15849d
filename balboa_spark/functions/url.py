"""URL scalar functions for crawl curation — pure Column expressions.

The WET source (sources/wet.py) yields a ``target_uri`` per record;
crawl curation is largely DOMAIN curation (C4 filters whole domains,
quality/toxicity lists key on the registered domain, per-domain caps
stop a single site from dominating the mixture). These functions
decompose URLs entirely in whole-stage codegen — one regexp_extract
per part over patterns written to the Java-regex/RE2 common subset —
and every constant is shared with a DuckDB SQL generator so the
kernels are oracle-gradeable (the html_to_text pattern).

``registered_domain`` is a declared heuristic, not a Public Suffix
List lookup: last two host labels, or three when the two-label tail
is a common second-level registry (SECOND_LEVEL_SUFFIXES). The full
PSL is a 10k-line moving target; pipelines needing it should map the
host column through a broadcast PSL relation instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (name, pattern, group) — regexp_extract specs shared with SQL.
URL_PART_RES: tuple[tuple[str, str, int], ...] = (
    ("scheme", r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1),
    ("host", r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1),
    ("port", r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?[^/:?#]+:([0-9]+)", 1),
    ("path", r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1),
    ("query", r"\?([^#]*)", 1),
    # no $ anchor and no dot: Java's $ matches before a final line
    # terminator and its . excludes \r, RE2's $ is end-of-text and its
    # . excludes only \n — an explicit class keeps both engines equal
    # on un-stripped crawl URIs
    ("fragment", r"#([^\r\n]*)", 1),
)

#: common second-level registries where the registrable name is three
#: labels (host a.b.co.uk -> b.co.uk). Deliberately small + documented.
SECOND_LEVEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "co.za", "com.tr", "com.ar",
)


def url_part(url: Column, name: str) -> Column:
    """One URL component ('' when absent — regexp_extract semantics,
    identical in DuckDB); host is lowercased."""
    for part, pat, grp in URL_PART_RES:
        if part == name:
            out = F.regexp_extract(url, pat, grp)
            return F.lower(out) if name == "host" else out
    raise ValueError(f"unknown url part: {name}")


def registered_domain(url: Column) -> Column:
    """Heuristic registrable domain of the URL's host: strip a leading
    'www.', keep the last two labels — three when the two-label tail
    is a known second-level registry; IP hosts and single-label hosts
    pass through whole."""
    host = F.regexp_replace(url_part(url, "host"), r"^www\.", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    is_ip = host.rlike(r"^[0-9.]+$")
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    second_level = F.array(*[F.lit(s) for s in SECOND_LEVEL_SUFFIXES])
    return (
        F.when(url.isNull(), F.lit(None).cast("string"))
        .when(is_ip | (n <= 2), host)
        .when(F.array_contains(second_level, last2) & (n >= 3), last3)
        .otherwise(last2)
    )


# --- DuckDB replay (shared-constants oracle generators) --------------------

def _q(s: str) -> str:
    # plain '...' literal: DuckDB treats backslash literally (regexes
    # pass through unescaped); only the quote needs doubling
    return "'" + s.replace("'", "''") + "'"


def url_part_sql(expr: str, name: str) -> str:
    for part, pat, grp in URL_PART_RES:
        if part == name:
            out = f"regexp_extract({expr}, {_q(pat)}, {grp})"
            return f"lower({out})" if name == "host" else out
    raise ValueError(f"unknown url part: {name}")


_WWW_RE = r"^www\."


def registered_domain_sql(expr: str) -> str:
    host = f"regexp_replace({url_part_sql(expr, 'host')}, {_q(_WWW_RE)}, '')"
    suffixes = ", ".join(f"'{s}'" for s in SECOND_LEVEL_SUFFIXES)
    return (
        f"CASE WHEN regexp_matches({host}, '^[0-9.]+$')"
        f" OR len(string_split({host}, '.')) <= 2 THEN {host} "
        f"WHEN list_contains([{suffixes}],"
        f" array_to_string(string_split({host}, '.')[-2:], '.'))"
        f" AND len(string_split({host}, '.')) >= 3"
        f" THEN array_to_string(string_split({host}, '.')[-3:], '.') "
        f"ELSE array_to_string(string_split({host}, '.')[-2:], '.') END"
    )
