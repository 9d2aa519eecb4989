"""URL canonicalization: RFC 3986 normalization subset + SURT form.

The reference crawler dedups on *raw* URL strings
(`/root/reference/monitoring/duplicate_detector.py:45-55`) and its only URL
manipulation is `urljoin` relative→absolute resolution
(`/root/reference/crawler/templates/html_template.py:130`). Canonicalization
is therefore new engine capability (SURVEY.md §2.9 C1-C3, north_rule).

Three implementations that MUST agree (property-tested in
tests/test_urlnorm.py):

1. ``canonical_url`` / ``surt_url`` / ``url_host`` — **Spark column
   expressions** (primary). Pure built-in functions → whole-stage codegen,
   no Python in the hot path at 10^10-URL scale.
2. ``canonicalize_py`` — pure-Python kernel used by the reference-semantics
   oracle and fixture generators.
3. ``duckdb_canonical_sql`` / ``duckdb_surt_sql`` — DuckDB SQL text for the
   driver's oracle comparison.

Normalization steps (applied in order; documented contract):

  a. trim whitespace
  b. lowercase scheme and host
  c. drop the fragment (``#...``)
  d. strip userinfo (``user:pass@``) from the authority
  e. strip a trailing ``.`` from the host
  f. drop default ports (http:80, https:443); keep explicit non-default ports
  g. strip one leading ``www.`` label
  h. empty path → ``/``; strip trailing slashes from non-root paths
  i. drop empty query; sort ``&``-separated query params bytewise
  j. canonical = ``scheme://host[:port]path[?sorted_query]``
  k. SURT = ``reversed,host[:port])path[?sorted_query]`` (Heritrix-style,
     scheme dropped — scheme variants of one resource collapse)

Percent-encoding normalization and dot-segment removal are handled only in
the vectorized resolver (``resolve_urls``), which is where relative hrefs
enter the system; canonical inputs to the frontier are absolute URLs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# 1. Spark column expressions (primary, JVM-side)
# ---------------------------------------------------------------------------

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def _parts(url: Column) -> dict[str, Column]:
    """Decompose a trimmed absolute URL into normalized parts (columns)."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    no_frag = F.regexp_replace(rest, "#.*$", "")
    authority = F.regexp_extract(no_frag, "^([^/?]*)", 1)
    hostport = F.element_at(F.split(authority, "@"), -1)
    host = F.regexp_replace(
        F.regexp_replace(F.lower(F.regexp_replace(hostport, ":[0-9]*$", "")), "\\.$", ""),
        "^www\\.",
        "",
    )
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    port_part = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    pathq = F.regexp_extract(no_frag, "^[^/?]*(.*)$", 1)
    raw_path = F.regexp_extract(pathq, "^([^?]*)", 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(
        F.when(raw_path == "/", raw_path).otherwise(F.regexp_replace(raw_path, "/+$", ""))
    )
    query = F.regexp_extract(pathq, "\\?(.*)$", 1)
    qsorted = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda x: x != "")), "&"
    )
    qpart = F.when(qsorted == "", F.lit("")).otherwise(F.concat(F.lit("?"), qsorted))
    return {
        "scheme": scheme,
        "host": host,
        "port_part": port_part,
        "path": path,
        "qpart": qpart,
    }


def url_host(url: Column | str) -> Column:
    """Normalized host (lowercased, no userinfo/port/trailing-dot/www)."""
    url = F.col(url) if isinstance(url, str) else url
    return _parts(url)["host"]


def canonical_url(url: Column | str) -> Column:
    """RFC 3986-normalized canonical URL (steps a-j above)."""
    url = F.col(url) if isinstance(url, str) else url
    p = _parts(url)
    return F.concat(
        p["scheme"], F.lit("://"), p["host"], p["port_part"], p["path"], p["qpart"]
    )


def surt_url(url: Column | str) -> Column:
    """SURT form: ``com,example[:port])/path?a=1`` — the dedup key."""
    url = F.col(url) if isinstance(url, str) else url
    p = _parts(url)
    rev_host = F.array_join(F.reverse(F.split(p["host"], "\\.")), ",")
    return F.concat(rev_host, p["port_part"], F.lit(")"), p["path"], p["qpart"])


# ---------------------------------------------------------------------------
# 2. Pure-Python kernel (oracle + fixtures). Must match the columns exactly.
# ---------------------------------------------------------------------------


def _parts_py(url: str) -> tuple[str, str, str, str, str]:
    u = url.strip()
    scheme, sep, rest = u.partition("://")
    if not sep:
        scheme, rest = "", u
    scheme = scheme.lower()
    no_frag = rest.split("#", 1)[0]
    # authority = up to first '/' or '?'
    end = len(no_frag)
    for ch in "/?":
        i = no_frag.find(ch)
        if i != -1:
            end = min(end, i)
    authority, pathq = no_frag[:end], no_frag[end:]
    hostport = authority.rsplit("@", 1)[-1]
    host = hostport
    port = ""
    if ":" in hostport:
        h, _, p = hostport.rpartition(":")
        if p.isdigit() or p == "":
            host, port = h, p
    host = host.lower().rstrip(".")
    if host.startswith("www."):
        host = host[4:]
    if port == "" or (scheme == "http" and port == "80") or (scheme == "https" and port == "443"):
        port_part = ""
    else:
        port_part = ":" + port
    raw_path, qsep, query = pathq.partition("?")
    if raw_path == "":
        path = "/"
    elif raw_path == "/":
        path = "/"
    else:
        path = raw_path.rstrip("/") or "/"
    params = sorted(x for x in query.split("&") if x != "")
    qpart = "?" + "&".join(params) if params else ""
    return scheme, host, port_part, path, qpart


def canonicalize_py(url: str) -> str:
    scheme, host, port_part, path, qpart = _parts_py(url)
    return f"{scheme}://{host}{port_part}{path}{qpart}"


def surt_py(url: str) -> str:
    _, host, port_part, path, qpart = _parts_py(url)
    rev = ",".join(reversed(host.split(".")))
    return f"{rev}{port_part}){path}{qpart}"


def host_py(url: str) -> str:
    return _parts_py(url)[1]


# ---------------------------------------------------------------------------
# 3. DuckDB SQL mirror (for the driver's oracle comparison)
# ---------------------------------------------------------------------------


def _duckdb_parts(e: str) -> dict[str, str]:
    """DuckDB SQL expressions for the normalized parts of URL expression e.

    DuckDB regexp_replace replaces only the FIRST match unless the 'g' flag
    is passed — every pattern here is either anchored or passed 'g'.
    """
    u = f"trim({e})"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    rest = f"regexp_replace({u}, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    no_frag = f"regexp_replace({rest}, '#.*$', '')"
    authority = f"regexp_extract({no_frag}, '^([^/?]*)', 1)"
    hostport = f"list_extract(string_split({authority}, '@'), -1)"
    host = (
        "regexp_replace(regexp_replace(lower(regexp_replace("
        f"{hostport}, ':[0-9]*$', '')), '\\.$', ''), '^www\\.', '')"
    )
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    port_part = (
        f"CASE WHEN {port} = '' OR ({scheme} = 'http' AND {port} = '80') "
        f"OR ({scheme} = 'https' AND {port} = '443') THEN '' "
        f"ELSE ':' || {port} END"
    )
    pathq = f"regexp_extract({no_frag}, '^[^/?]*(.*)$', 1)"
    raw_path = f"regexp_extract({pathq}, '^([^?]*)', 1)"
    path = (
        f"CASE WHEN {raw_path} = '' THEN '/' WHEN {raw_path} = '/' THEN '/' "
        f"ELSE regexp_replace({raw_path}, '/+$', '') END"
    )
    query = f"regexp_extract({pathq}, '\\?(.*)$', 1)"
    # COALESCE: DuckDB's array_to_string([]) is NULL, Spark's array_join is ''
    qsorted = (
        f"COALESCE(array_to_string(list_sort(list_filter(string_split({query}, '&'), "
        f"x -> x <> '')), '&'), '')"
    )
    qpart = f"CASE WHEN {qsorted} = '' THEN '' ELSE '?' || {qsorted} END"
    return {
        "scheme": scheme,
        "host": host,
        "port_part": port_part,
        "path": path,
        "qpart": qpart,
    }


def duckdb_canonical_sql(e: str) -> str:
    p = _duckdb_parts(e)
    return f"{p['scheme']} || '://' || {p['host']} || {p['port_part']} || {p['path']} || {p['qpart']}"


def duckdb_surt_sql(e: str) -> str:
    p = _duckdb_parts(e)
    rev = f"array_to_string(list_reverse(string_split({p['host']}, '.')), ',')"
    return f"{rev} || {p['port_part']} || ')' || {p['path']} || {p['qpart']}"


def duckdb_host_sql(e: str) -> str:
    return _duckdb_parts(e)["host"]


# ---------------------------------------------------------------------------
# 4. Vectorized relative-URL resolution (link expansion boundary)
# ---------------------------------------------------------------------------


def _resolve_series(base: pd.Series, href: pd.Series) -> pd.Series:
    """urljoin over pandas Series — the reference's C1 operator
    (`html_template.py:130`), vectorized per Arrow batch."""
    from urllib.parse import urljoin

    return pd.Series(
        [urljoin(b, h) if h else None for b, h in zip(base, href)],
        index=href.index,
        dtype="object",
    )


def resolve_urls(base: Column | str, href: Column | str) -> Column:
    """Resolve possibly-relative hrefs against their page URL (Arrow batch).

    This is the only Python step in the URL path; it runs once per
    discovered link at link-expansion time, before canonicalization.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    # asNondeterministic: urljoin IS deterministic, but a deterministic
    # Python UDF gets DUPLICATED by filter/projection pushdown (the predicate
    # substitution inlines the expression → two ArrowEvalPython passes per
    # row, observed in the discover_links plan). Marking it nondeterministic
    # forbids Catalyst from cloning or re-ordering it — one Arrow pass.
    resolver = pandas_udf(_resolve_series, StringType()).asNondeterministic()
    base = F.col(base) if isinstance(base, str) else base
    href = F.col(href) if isinstance(href, str) else href
    return resolver(base, href)
