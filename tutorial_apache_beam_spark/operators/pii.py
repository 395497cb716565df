"""PII redaction and URL normalization for training-data curation.

Large-scale pretraining pipelines scrub personally identifiable
information (emails, phone numbers, IP addresses) and canonicalize URLs
before dedup — public practice documented in the C4 / RefinedWeb /
Dolma dataset papers. The reference repo has no text pipeline at all
(it is a two-pipeline Beam tutorial; see `Demo1.java:33-107`), so this
module is part of the LLM-extension scope the engine brief adds.

Everything here is built-in `regexp_replace` / `regexp_extract` /
`regexp_count` expression chains — JVM codegen, no Python row path, so
redaction runs at scan throughput and composes with any plan. The
patterns avoid constructs whose semantics differ between Java regex
(Spark) and RE2 (DuckDB): no lookaround, no backreferences in the
pattern, explicit character classes only — so every operator here is
DuckDB-oracle-checkable bit-for-bit.

At 100 TB: map-only (no shuffle, no state); filters/projections around
it still push to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Conservative, cross-engine-identical patterns (Java regex == RE2 for
# these constructs). Kept simple on purpose: the goal is deterministic,
# oracle-checkable behavior, not maximal recall of exotic formats.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,6}"

# Order matters: emails first (an email never contains an IP-shaped
# substring, but a phone regex must not eat the digits of an IP — the
# hyphen-separated PHONE_RE cannot match inside a dotted quad).
_REDACTIONS: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def redact_pii(col: Column | str) -> Column:
    """Replace every email / IPv4 / phone occurrence with a typed tag."""
    out = F.col(col) if isinstance(col, str) else col
    for _name, pattern, tag in _REDACTIONS:
        out = F.regexp_replace(out, pattern, tag)
    return out


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-category match counts (pre-redaction) as integer columns."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        f"pii_{name}_cnt": F.regexp_count(c, F.lit(pattern)).cast("int")
        for name, pattern, _tag in _REDACTIONS
    }


def redact_pii_sql(expr: str) -> str:
    """The identical redaction chain in DuckDB SQL (oracle side)."""
    out = expr
    for _name, pattern, tag in _REDACTIONS:
        out = f"regexp_replace({out}, '{pattern}', '{tag}', 'g')"
    return out


def pii_counts_sql(expr: str) -> dict[str, str]:
    return {
        f"pii_{name}_cnt": (
            f"CAST(len(regexp_extract_all({expr}, '{pattern}')) AS INT)"
        )
        for name, pattern, _tag in _REDACTIONS
    }


# --- URL normalization ------------------------------------------------------

_TRACKING_PARAM = r"utm_[A-Za-z0-9_]*=[^&#]*"


def normalize_url(col: Column | str) -> Column:
    """Canonicalize a URL for dedup keying:

    1. lowercase the scheme and host (path/query stay case-sensitive);
    2. drop the default port (:80 / :443);
    3. drop the fragment;
    4. drop `utm_*` tracking parameters (fixing separators);
    5. drop a trailing '/' and a dangling '?'.

    Pure expression chain; `$1`-style group references appear only in
    REPLACEMENT strings (engine-local syntax — the oracle uses `\\1`),
    never in patterns.
    """
    url = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    rest = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    # Strip the DEFAULT port only, scheme-aware, from the authority alone
    # (a ':443' inside the path must survive; http://a.com:443 is a
    # DIFFERENT origin than http://a.com and must not merge).
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(host, r":443$", "")).otherwise(
            host
        )
    )
    out = F.concat(scheme, F.lit("://"), host, rest)
    # fragment
    out = F.regexp_replace(out, r"#.*$", "")
    # utm params: mid-query ("utm_x=1&") then trailing ("?utm_x=1" / "&utm_x=1")
    out = F.regexp_replace(out, _TRACKING_PARAM + r"&", "")
    out = F.regexp_replace(out, r"[?&]" + _TRACKING_PARAM + r"$", "")
    # dangling separators / trailing slash
    out = F.regexp_replace(out, r"\?$", "")
    out = F.regexp_replace(out, r"/$", "")
    # Scheme-less inputs (no '://') have nothing to normalize against —
    # pass them through unchanged rather than collapsing them all to the
    # constant '://' (which would make url_dedup silently merge unrelated
    # rows).
    return F.when(scheme == "", url).otherwise(out)


def normalize_url_sql(expr: str) -> str:
    """The identical normalization in DuckDB SQL."""
    scheme = f"lower(regexp_extract({expr}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    host = f"lower(regexp_extract({expr}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"
    rest = f"regexp_extract({expr}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1)"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host}, ':443$', '') "
        f"ELSE {host} END"
    )
    out = f"concat({scheme}, '://', {host}, {rest})"
    out = f"regexp_replace({out}, '#.*$', '', 'g')"
    out = f"regexp_replace({out}, '{_TRACKING_PARAM}&', '', 'g')"
    out = f"regexp_replace({out}, '[?&]{_TRACKING_PARAM}$', '', 'g')"
    out = f"regexp_replace({out}, '\\?$', '', 'g')"
    out = f"regexp_replace({out}, '/$', '', 'g')"
    # NULL input must stay NULL: DuckDB's concat() treats NULL arguments
    # as '' (unlike Spark's, which propagates), so without this guard a
    # NULL url would normalize to the constant '://' on the oracle side.
    return (
        f"CASE WHEN {expr} IS NULL THEN NULL "
        f"WHEN {scheme} = '' THEN {expr} ELSE {out} END"
    )


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per NORMALIZED url.

    Hash-groupBy on the canonical key — the standard first dedup pass of
    a web-scale corpus (one shuffle on the normalized key; map-side
    partial min applies).
    """
    norm = normalize_url(F.col(url_col)).alias("norm_url")
    return (
        df.select(F.col(id_col), norm)
        .groupBy("norm_url")
        .agg(F.min(id_col).alias(id_col))
    )
