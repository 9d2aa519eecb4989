"""Pure-Python reference-semantics oracle (SURVEY.md §5).

A compact single-threaded restatement of the reference crawler's per-cycle
semantics, used to pin the Spark engine's equivalence mode:

- sources processed sequentially in config order
  (`/root/reference/main.py:357`)
- within a source, candidates in discovery (feed) order
  (`rss_template.py:54-64`)
- rows missing title/url dropped at discovery, not counted
  (`rss_template.py:97-102`)
- the per-source cap counts only SUCCESSFULLY processed articles and is
  checked before each candidate (`base_template.py:146-151,189-191` —
  `articles_processed` increments only after store succeeds; dup-skips and
  failures consume no slot)
- dup-check marks a URL seen at CHECK time, so a URL whose extraction later
  fails is still seen (`duplicate_detector.py:35-66` — the LRU insert
  happens inside is_duplicate)
- extraction fails below the min-content threshold
  (`rss_template.py:323-327`)
- disabled sources skipped entirely (`source_factory.py:125-127`)

The oracle also models the two engine additions (north_rule) the reference
lacks, gated by flags so equivalence mode can switch them off:
- ``canonical=True``  : dedup on SURT form instead of raw URL
- ``robots``          : per-host disallow prefixes filter candidates before
  the dup check (a robots-blocked URL is never fetched and never seen)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.urlnorm import surt_py
from ..sources.synthetic import MIN_CONTENT_LEN, Candidate, HostPolicy, SourceCfg


@dataclass
class OracleResult:
    order: list[str] = field(default_factory=list)  # fetched URLs in crawl order
    seen: set[str] = field(default_factory=set)  # dedup keys marked seen
    fetched: list[Candidate] = field(default_factory=list)
    stats: dict[str, int] = field(default_factory=dict)


def _dedup_key(url: str, canonical: bool) -> str:
    return surt_py(url) if canonical else url.strip()


def crawl_cycle(
    sources: list[SourceCfg],
    candidates: list[Candidate],
    wave: int,
    seen: set[str] | None = None,
    canonical: bool = False,
    policies: list[HostPolicy] | None = None,
    min_content_len: int = MIN_CONTENT_LEN,
) -> OracleResult:
    """Run one reference crawl cycle over this wave's candidates."""
    res = OracleResult(seen=set(seen or ()))
    disallow = {}
    if policies:
        disallow = {p.host: p.robots_disallow for p in policies}
    stats = {"discovered": 0, "processed": 0, "failed": 0, "skipped": 0, "robots_blocked": 0}

    for src in sorted(sources, key=lambda s: s.source_id):
        if not src.enabled:
            continue
        cands = sorted(
            (c for c in candidates if c.source_id == src.source_id and c.wave == wave),
            key=lambda c: c.feed_rank,
        )
        processed = 0
        for c in cands:
            if processed >= src.max_articles_per_run:
                break
            if not c.title or not c.url:
                continue  # dropped at discovery — not "discovered"
            if disallow:
                from ..functions.urlnorm import _parts_py

                host = _parts_py(c.url)[1]
                path = _parts_py(c.url)[3]
                rules = disallow.get(host, ())
                if any(path.startswith(pref) for pref in rules):
                    stats["robots_blocked"] += 1
                    continue
            stats["discovered"] += 1
            key = _dedup_key(c.url, canonical)
            if key in res.seen:
                stats["skipped"] += 1
                continue
            res.seen.add(key)  # marked at check time (duplicate_detector.py)
            if c.content_len < min_content_len:
                stats["failed"] += 1
                continue
            processed += 1
            stats["processed"] += 1
            res.order.append(c.url)
            res.fetched.append(c)

    res.stats = stats
    return res


def expected_rows(result: OracleResult, seed: int = 42) -> list[dict]:
    """Materialize the oracle's fetched rows through the shared payload
    kernel — the `expected_rows` table of FIXTURES.md §5."""
    from ..sources.synthetic import fetch_payload_py

    rows = []
    for seq, c in enumerate(result.fetched):
        row = fetch_payload_py(c.url, c.source_name, seed)
        row.update(url=c.url, seq=seq, source_id=c.source_id, wave=c.wave)
        rows.append(row)
    return rows
