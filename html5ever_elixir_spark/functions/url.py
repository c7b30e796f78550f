"""URL column functions — JVM-side expressions only (no UDFs), so they
stay inside whole-stage codegen and push into scans where possible.

Used by the pipeline for host bucketing/metrics and by dedup for
same-site blocking.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"


def host_of(url) -> Column:
    """Hostname of a URL (lowercased); empty string when unparseable."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def registered_domain(url) -> Column:
    """Last two host labels — an eTLD+1 approximation (a real public-
    suffix list is a lookup table join at scale; this is the cheap
    codegen-only variant for bucketing)."""
    host = host_of(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
    ).otherwise(host)


def normalize_url(url) -> Column:
    """Canonical form for dedup keys: lowercase scheme+host, strip
    default ports, drop fragments, strip trailing slash on bare paths."""
    url = F.col(url) if isinstance(url, str) else url
    no_frag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    rest = F.regexp_replace(no_frag, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    hostpart = F.lower(F.regexp_extract(rest, r"^([^/]*)", 1))
    hostpart = F.regexp_replace(hostpart, r"^[^@]*@", "")  # strip userinfo
    # strip only the scheme's OWN default port: http://host:443 is a
    # distinct origin from http://host and must not collapse
    hostpart = F.when(
        scheme == "http", F.regexp_replace(hostpart, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostpart, r":443$", "")
    ).otherwise(hostpart)
    path = F.regexp_replace(rest, r"^[^/]*", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.regexp_replace(path, r"^(/.+?)/$", r"$1")
    # unparseable input (no scheme) passes through untouched
    return F.when(scheme == "", url).otherwise(
        F.concat(scheme, F.lit("://"), hostpart, path)
    )


def duck_normalize_url_sql(col: str) -> str:
    """DuckDB mirror of :func:`normalize_url` (independent
    implementation, same contract — the differential gate for URL
    canonicalization). Anchored patterns, so first-match replace
    semantics equal Spark's replace-all."""
    nofrag = f"regexp_replace({col}, '#.*$', '')"
    scheme = (
        f"lower(regexp_extract({nofrag}, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    )
    rest = f"regexp_replace({nofrag}, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '')"
    host0 = (
        f"regexp_replace(lower(regexp_extract({rest}, '^([^/]*)', 1)), "
        "'^[^@]*@', '')"
    )
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host0}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host0}, ':443$', '') "
        f"ELSE {host0} END"
    )
    path0 = f"regexp_replace({rest}, '^[^/]*', '')"
    path = (
        f"regexp_replace(CASE WHEN {path0} = '' THEN '/' ELSE {path0} END, "
        "'^(/.+?)/$', '\\1')"
    )
    return (
        f"CASE WHEN {scheme} = '' THEN {col} "
        f"ELSE {scheme} || '://' || {host} || {path} END"
    )
