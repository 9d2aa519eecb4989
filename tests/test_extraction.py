"""Content-tier extraction fallback: per-row short-circuit semantics and
the reference's attempt/success counting (hierarchical_template.py:96-127)."""

from __future__ import annotations

from newsraag_crawler_spark.operators.extraction import (
    extraction_fallback,
    extraction_method_stats,
)

OK = {"crawl4ai": "ok_c4", "beautifulsoup": "ok_bs", "rss": "ok_rss"}
CONTENT = {"crawl4ai": "c_c4", "beautifulsoup": "c_bs", "rss": "c_rss"}


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, a, b, c, "md", "html", "rss") for i, (a, b, c) in enumerate(rows)],
        ["doc_id", "ok_c4", "ok_bs", "ok_rss", "c_c4", "c_bs", "c_rss"],
    )


def test_per_row_short_circuit(spark):
    df = _mk(
        spark,
        [
            (True, True, True),    # crawl4ai wins, bs/rss never tried
            (False, True, True),   # bs wins
            (False, False, True),  # rss wins
            (False, False, False), # all fail
        ],
    )
    out = extraction_fallback(df, OK, CONTENT).orderBy("doc_id").collect()
    assert [r.method for r in out] == ["crawl4ai", "beautifulsoup", "rss", "failed"]
    assert [r.content for r in out] == ["md", "html", "rss", None]
    assert out[0].tried == ["crawl4ai"]
    assert out[1].tried == ["crawl4ai", "beautifulsoup"]
    assert out[2].tried == ["crawl4ai", "beautifulsoup", "rss"]
    assert out[3].tried == ["crawl4ai", "beautifulsoup", "rss", "failed"]


def test_method_stats_counting(spark):
    # 2 c4 wins, 1 bs win, 1 rss win, 1 total failure
    df = _mk(
        spark,
        [
            (True, False, False),
            (True, True, False),
            (False, True, True),
            (False, False, True),
            (False, False, False),
        ],
    )
    stats = {
        r.method: r
        for r in extraction_method_stats(extraction_fallback(df, OK, CONTENT)).collect()
    }
    # attempts: c4 tried on all 5; bs on the 3 c4-misses; rss on the 2
    # bs-misses; failed pseudo-attempt once. Reference counting exactly.
    assert (stats["crawl4ai"].attempts, stats["crawl4ai"].successes) == (5, 2)
    assert (stats["beautifulsoup"].attempts, stats["beautifulsoup"].successes) == (3, 1)
    assert (stats["rss"].attempts, stats["rss"].successes) == (2, 1)
    assert (stats["failed"].attempts, stats["failed"].successes) == (1, 0)
    total = 5 + 3 + 2 + 1
    assert stats["crawl4ai"].usage_percent == 5 / total * 100
    assert stats["rss"].success_rate == 1 / 2 * 100
