"""Extraction scalars: fuzzy date chain, HTML date/text extraction, XML
repair, title/boilerplate cleaning — the reference's BeautifulSoup/dateutil
family re-expressed as JVM regexp column expressions (whole-stage codegen,
zero Python), each with a DuckDB SQL mirror for the oracle gate.

Reference parity targets (SURVEY.md §2.9):
- C7  fuzzy date chain, all 5 regex shapes + deterministic fallback
      (`/root/reference/crawler/templates/rss_template.py:186-264`; the
      now()-30d fallback becomes a fixed date, and extracted timezone
      abbreviations are dropped — naive timestamps keep both engines and
      both runs bit-identical)
- C8  HTML date extraction: time[datetime] attr → article:published_time →
      meta[name=date] (`html_template.py:281-329`)
- C11 HTML text extraction: decompose script/style/nav/header/footer, strip
      tags, collapse whitespace (`html_template.py:208-265`) — a regexp
      approximation of soup.get_text (bs4 is not a engine dependency)
- C10 boilerplate strip: "Subscribe to…newsletter", "Follow us on…social"
      (`base_template.py:335-345`)
- C13 title suffix strip: `re.sub(r'\\s*[-|]\\s*[^-|]*$', '', title)`
      (`html_template.py:243`)
- C12 XML repair: void-tag closing + declaration normalization
      (`robust_rss_parser.py:379-399`)

Every builder comes in a (Spark Column, DuckDB SQL string) pair with
IDENTICAL regexes; patterns avoid backreferences because DuckDB's RE2 has
none.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# C7 — fuzzy publication-date chain (5 patterns, priority order)
# ---------------------------------------------------------------------------

# group 1 of each pattern is the date string handed to the parser
FUZZY_P1 = r"Date:\s*(\w{3,9}\.?\s+\d{1,2},\s+\d{4},\s+\d{1,2}:\d{2}\s+[AP]M\s+\w{2,4})"
FUZZY_P2 = r"Updated[:\s]*(\w{3,9}\.?\s+\d{1,2},\s+\d{4},\s+\d{1,2}:\d{2}\s+[AP]M\s+\w{2,4})"
FUZZY_P3 = r"Date:\s*(\w{3,9}\.?\s+\d{1,2},\s+\d{4})"
FUZZY_P4 = r"(\w{3,9}\.?\s+\d{1,2},\s+\d{4}[,\s]+\d{1,2}:\d{2}\s*[AP]M)"
FUZZY_P5 = r"(\d{1,2}/\d{1,2}/\d{4}|\w{3,9}\s+\d{1,2},?\s+\d{4})"  # title, last resort

FUZZY_FALLBACK = "2026-01-01 00:00:00"  # deterministic stand-in for now()-30d
_TZ_TAIL = r"\s+\w{2,4}$"  # trailing timezone abbreviation to drop


def _spark_dt(ext: Column, fmt: str, drop_tz: bool) -> Column:
    s = F.regexp_replace(ext, _TZ_TAIL, "") if drop_tz else ext
    s = F.regexp_replace(s, r"\.", "")  # month-abbreviation dot ("Oct.")
    # try_to_timestamp, NOT to_timestamp: Spark 4 ANSI mode makes a failed
    # parse ABORT THE JOB, but a loose regex match can be unparseable
    # ("Markets on 13/45/2024", "January 99, 2024") — the reference's
    # try/except chain (rss_template.py:186-264) falls through to the next
    # pattern instead; one bad page must not kill a crawl.
    return F.try_to_timestamp(s, F.lit(fmt))


def _duck_dt(ext: str, fmt: str, drop_tz: bool) -> str:
    s = f"regexp_replace({ext}, '{_TZ_TAIL}', '')" if drop_tz else ext
    return f"try_strptime(replace({s}, '.', ''), '{fmt}')"


def fuzzy_published_ts(content: Column | str, title: Column | str) -> tuple[Column, Column]:
    """(published_ts, matched_pattern 1-5 / 0=fallback) — the reference's
    whole date-extraction chain as one coalesce."""
    c, t = _c(content), _c(title)
    e1 = F.regexp_extract(c, "(?i)" + FUZZY_P1, 1)
    e2 = F.regexp_extract(c, "(?i)" + FUZZY_P2, 1)
    e3 = F.regexp_extract(c, "(?i)" + FUZZY_P3, 1)
    e4 = F.regexp_extract(c, "(?i)" + FUZZY_P4, 1)
    e5 = F.regexp_extract(t, "(?i)" + FUZZY_P5, 1)
    p1 = F.when(e1 != "", _spark_dt(e1, "MMM dd, yyyy, hh:mm a", drop_tz=True))
    p2 = F.when(e2 != "", _spark_dt(e2, "MMM dd, yyyy, hh:mm a", drop_tz=True))
    # simple dates default to 09:00 UTC (rss_template.py:227-230)
    p3 = F.when(
        e3 != "", _spark_dt(e3, "MMM dd, yyyy", drop_tz=False) + F.expr("INTERVAL 9 HOURS")
    )
    p4 = F.when(e4 != "", _spark_dt(e4, "MMM dd, yyyy, hh:mm a", drop_tz=False))
    p5 = F.when(
        e5 != "",
        F.when(e5.contains("/"), F.try_to_timestamp(e5, F.lit("MM/dd/yyyy"))).otherwise(
            _spark_dt(e5, "MMM dd, yyyy", drop_tz=False)
        ),
    )
    ts = F.coalesce(p1, p2, p3, p4, p5, F.lit(FUZZY_FALLBACK).cast("timestamp"))
    pat = (
        F.when(p1.isNotNull(), 1)
        .when(p2.isNotNull(), 2)
        .when(p3.isNotNull(), 3)
        .when(p4.isNotNull(), 4)
        .when(p5.isNotNull(), 5)
        .otherwise(0)
    )
    return ts, pat


def fuzzy_published_ts_sql(content: str, title: str) -> tuple[str, str]:
    """DuckDB mirror of fuzzy_published_ts: (ts_expr, pattern_expr)."""
    e1 = f"regexp_extract({content}, '(?i){FUZZY_P1}', 1)"
    e2 = f"regexp_extract({content}, '(?i){FUZZY_P2}', 1)"
    e3 = f"regexp_extract({content}, '(?i){FUZZY_P3}', 1)"
    e4 = f"regexp_extract({content}, '(?i){FUZZY_P4}', 1)"
    e5 = f"regexp_extract({title}, '(?i){FUZZY_P5}', 1)"
    p1 = f"CASE WHEN {e1} <> '' THEN {_duck_dt(e1, '%b %d, %Y, %I:%M %p', True)} END"
    p2 = f"CASE WHEN {e2} <> '' THEN {_duck_dt(e2, '%b %d, %Y, %I:%M %p', True)} END"
    p3 = f"CASE WHEN {e3} <> '' THEN {_duck_dt(e3, '%b %d, %Y', False)} + INTERVAL 9 HOUR END"
    p4 = f"CASE WHEN {e4} <> '' THEN {_duck_dt(e4, '%b %d, %Y, %I:%M %p', False)} END"
    p5 = (
        f"CASE WHEN {e5} <> '' THEN (CASE WHEN contains({e5}, '/') "
        f"THEN try_strptime({e5}, '%m/%d/%Y') ELSE {_duck_dt(e5, '%b %d, %Y', False)} END) END"
    )
    ts = f"COALESCE({p1}, {p2}, {p3}, {p4}, {p5}, TIMESTAMP '{FUZZY_FALLBACK}')"
    pat = (
        f"CASE WHEN ({p1}) IS NOT NULL THEN 1 WHEN ({p2}) IS NOT NULL THEN 2 "
        f"WHEN ({p3}) IS NOT NULL THEN 3 WHEN ({p4}) IS NOT NULL THEN 4 "
        f"WHEN ({p5}) IS NOT NULL THEN 5 ELSE 0 END"
    )
    return ts, pat


# ---------------------------------------------------------------------------
# C6 — structured date parse (feedparser's published_parsed path)
# ---------------------------------------------------------------------------
# The reference's COMMON case: feedparser hands back a parsed struct_time →
# epoch (`rss_template.py:140-152`); only when that is absent does the fuzzy
# chain run. Relationally the struct path is (a) an RFC-822 pubDate string,
# (b) a raw epoch-seconds string; both tried AHEAD of the fuzzy chain.

# formatting side (fixture synthesis); Spark can FORMAT 'EEE' but not parse
# it (day-of-week is a format-only field under the CORRECTED time parser),
# so the parse side strips the weekday prefix and uses the _PARSE formats
RFC822_FMT_SPARK = "EEE, dd MMM yyyy HH:mm:ss"
RFC822_FMT_DUCK = "%a, %d %b %Y %H:%M:%S"
RFC822_PARSE_SPARK = "dd MMM yyyy HH:mm:ss"
RFC822_PARSE_DUCK = "%d %b %Y %H:%M:%S"
_RFC822_DOW_HEAD = r"^[A-Za-z]{3},\s*"
_RFC822_TZ_TAIL = r"\s+(GMT|UTC|[+-]\d{4})$"
_EPOCH_SHAPE = r"^\d{9,11}$"
RFC822_PARSE_OFFSET_SPARK = "dd MMM yyyy HH:mm:ss Z"
RFC822_PARSE_OFFSET_DUCK = "%d %b %Y %H:%M:%S %z"


def structured_ts(pub: Column | str) -> Column:
    """RFC-822 pubDate or epoch-seconds string → timestamp (NULL on neither:
    the caller coalesces the fuzzy chain behind this).

    Numeric zone offsets are HONORED, not stripped (ADVICE r3: 'Mon, 01 Jan
    2024 12:00:00 -0500' must yield 17:00 UTC, matching the reference's
    feedparser → fromtimestamp(tz=utc) path, rss_template.py:140-152): the
    offset-aware parse runs first; only literal GMT/UTC tails (which the
    'Z' pattern cannot match) fall through to the offset-less parse, which
    reads the residual local time as UTC — correct for those two names.
    """
    p = F.trim(_c(pub))
    no_dow = F.regexp_replace(p, _RFC822_DOW_HEAD, "")
    with_off = F.try_to_timestamp(no_dow, F.lit(RFC822_PARSE_OFFSET_SPARK))
    stripped = F.regexp_replace(no_dow, _RFC822_TZ_TAIL, "")
    rfc = F.try_to_timestamp(stripped, F.lit(RFC822_PARSE_SPARK))
    epoch = F.when(p.rlike(_EPOCH_SHAPE), F.timestamp_seconds(p.cast("long")))
    return F.coalesce(with_off, rfc, epoch)


def structured_ts_sql(pub: str) -> str:
    p = f"trim({pub})"
    no_dow = f"regexp_replace({p}, '{_RFC822_DOW_HEAD}', '')"
    # %z yields TIMESTAMPTZ; AT TIME ZONE 'UTC' renders it naive-UTC like
    # the Spark side (session tz pinned to UTC)
    with_off = (
        f"(try_strptime({no_dow}, '{RFC822_PARSE_OFFSET_DUCK}') AT TIME ZONE 'UTC')"
    )
    stripped = f"regexp_replace({no_dow}, '{_RFC822_TZ_TAIL}', '')"
    rfc = f"try_strptime({stripped}, '{RFC822_PARSE_DUCK}')"
    epoch = (
        f"CASE WHEN regexp_matches({p}, '{_EPOCH_SHAPE}') "
        f"THEN TIMESTAMP '1970-01-01 00:00:00' + {p}::BIGINT * INTERVAL 1 SECOND END"
    )
    return f"COALESCE({with_off}, {rfc}, {epoch})"


# ---------------------------------------------------------------------------
# C8 — HTML date extraction (time[datetime] → article:published_time → meta)
# ---------------------------------------------------------------------------

HTML_TIME_ATTR = r'<time[^>]*datetime="([^"]+)"'
HTML_META_PUBLISHED = r'<meta[^>]*property="article:published_time"[^>]*content="([^"]+)"'
HTML_META_DATE = r'<meta[^>]*name="date"[^>]*content="([^"]+)"'
_ISO_FMT_SPARK = "yyyy-MM-dd'T'HH:mm:ss"
_ISO_FMT_DUCK = "%Y-%m-%dT%H:%M:%S"


def html_published_ts(html: Column | str) -> tuple[Column, Column]:
    """(published_ts, source_rule) from raw HTML — html_template.py:281-329.
    Fallback is the deterministic FUZZY_FALLBACK (reference uses now())."""
    h = _c(html)
    exts = [
        ("time_attr", F.regexp_extract(h, "(?i)" + HTML_TIME_ATTR, 1)),
        ("meta_published", F.regexp_extract(h, "(?i)" + HTML_META_PUBLISHED, 1)),
        ("meta_date", F.regexp_extract(h, "(?i)" + HTML_META_DATE, 1)),
    ]
    # try_to_timestamp: real pages carry tz-offset or date-only datetime
    # attrs that this ISO format rejects — fall through, never abort (ANSI)
    parsed = [
        (name, F.when(e != "", F.try_to_timestamp(e, F.lit(_ISO_FMT_SPARK))))
        for name, e in exts
    ]
    ts = F.coalesce(*[p for _, p in parsed], F.lit(FUZZY_FALLBACK).cast("timestamp"))
    rule = F.lit("fallback")
    for name, p in reversed(parsed):
        rule = F.when(p.isNotNull(), F.lit(name)).otherwise(rule)
    return ts, rule


def html_published_ts_sql(html: str) -> tuple[str, str]:
    parts = []
    for name, pat in (
        ("time_attr", HTML_TIME_ATTR),
        ("meta_published", HTML_META_PUBLISHED),
        ("meta_date", HTML_META_DATE),
    ):
        e = f"regexp_extract({html}, '(?i){pat}', 1)"
        parts.append(
            (name, f"CASE WHEN {e} <> '' THEN try_strptime({e}, '{_ISO_FMT_DUCK}') END")
        )
    ts = "COALESCE(" + ", ".join(p for _, p in parts) + f", TIMESTAMP '{FUZZY_FALLBACK}')"
    rule = (
        "CASE "
        + " ".join(f"WHEN ({p}) IS NOT NULL THEN '{name}'" for name, p in parts)
        + " ELSE 'fallback' END"
    )
    return ts, rule


# ---------------------------------------------------------------------------
# C11 + C10 — HTML text extraction and boilerplate strip
# ---------------------------------------------------------------------------

# decomposed containers (html_template.py:216-225 unwanted_selectors, the
# tag subset expressible without a CSS engine); one pattern per tag because
# RE2 (DuckDB) has no backreferences
_DECOMPOSE_TAGS = ("script", "style", "nav", "header", "footer")
_TAG_RE = "<[^>]+>"
_BOILERPLATE = (r"Subscribe to.*?newsletter", r"Follow us on.*?social")


def html_text(html: Column | str) -> Column:
    """soup.get_text-style extraction: drop script/style/nav/header/footer
    subtrees, strip remaining tags, remove boilerplate, collapse whitespace."""
    from .text import clean_whitespace

    s = _c(html)
    for tag in _DECOMPOSE_TAGS:
        s = F.regexp_replace(s, f"(?is)<{tag}[^>]*>.*?</{tag}>", " ")
    s = F.regexp_replace(s, _TAG_RE, " ")
    for pat in _BOILERPLATE:
        s = F.regexp_replace(s, f"(?i){pat}", "")
    return clean_whitespace(s)


def html_text_sql(html: str) -> str:
    from .text import clean_whitespace_sql

    s = html
    for tag in _DECOMPOSE_TAGS:
        s = f"regexp_replace({s}, '(?is)<{tag}[^>]*>.*?</{tag}>', ' ', 'g')"
    s = f"regexp_replace({s}, '{_TAG_RE}', ' ', 'g')"
    for pat in _BOILERPLATE:
        s = f"regexp_replace({s}, '(?i){pat}', '', 'g')"
    return clean_whitespace_sql(s)


# ---------------------------------------------------------------------------
# C13 — title suffix strip
# ---------------------------------------------------------------------------

_TITLE_SUFFIX = r"\s*[-|]\s*[^-|]*$"


def strip_title_suffix(title: Column | str) -> Column:
    """Drop the trailing "- Site Name" / "| Site Name" segment."""
    return F.regexp_replace(_c(title), _TITLE_SUFFIX, "")


def strip_title_suffix_sql(title: str) -> str:
    return f"regexp_replace({title}, '{_TITLE_SUFFIX}', '')"


def html_title(html: Column | str) -> Column:
    """<title> text with the site-name suffix stripped (C13 applied to the
    page-title fallback path of html_template.py:236-245)."""
    return strip_title_suffix(
        F.trim(F.regexp_extract(_c(html), "(?is)<title>(.*?)</title>", 1))
    )


def html_title_sql(html: str) -> str:
    return strip_title_suffix_sql(
        f"trim(regexp_extract({html}, '(?is)<title>(.*?)</title>', 1))"
    )


# ---------------------------------------------------------------------------
# C12 — XML repair
# ---------------------------------------------------------------------------

_VOID_TAGS = ("br", "hr", "img")
_XML_DECL = r"^<\?xml[^?]*\?>\s*"
_CANON_DECL = '<?xml version="1.0" encoding="UTF-8"?>'


def xml_repair(xml: Column | str) -> Column:
    """robust_rss_parser._fix_xml_content: close void tags, normalize the
    XML declaration (only when one is present, as in the reference)."""
    s = _c(xml)
    for tag in _VOID_TAGS:
        s = F.replace(s, F.lit(f"<{tag}>"), F.lit(f"<{tag}/>"))
    return F.when(
        s.startswith("<?xml"),
        F.concat(F.lit(_CANON_DECL), F.regexp_replace(s, _XML_DECL, "")),
    ).otherwise(s)


def xml_repair_sql(xml: str) -> str:
    s = xml
    for tag in _VOID_TAGS:
        s = f"replace({s}, '<{tag}>', '<{tag}/>')"
    return (
        f"CASE WHEN starts_with({s}, '<?xml') THEN "
        f"'{_CANON_DECL}' || regexp_replace({s}, '{_XML_DECL}', '') "
        f"ELSE {s} END"
    )
