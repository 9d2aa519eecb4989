"""S1 YAML source scan: reference-format sources.yaml → sources dimension +
quarantine; the loaded config drives reference_schedule end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from newsraag_crawler_spark.sources.config_loader import (
    load_sources_yaml,
    to_schedule_dim,
)

YAML_TEXT = """
sources:
  - name: babysteps
    type: rss
    url: https://example.com/feed.rss
    rate_limit: 2
    max_articles: 3
    timeout: 90
    content_type: forex
  - name: newsline
    type: html
    url: https://example.org/index.html
    enabled: false
  - name: minimal
    type: rss
    url: https://example.net/f.xml
  - name: broken-no-url
    type: rss
  - name: weird
    type: carrier-pigeon
    url: https://example.com/x
  - just a string
"""


def _write(tmp_path, text):
    p = tmp_path / "sources.yaml"
    p.write_text(text)
    return str(p)


def test_yaml_load_valid_and_quarantine(spark, tmp_path):
    cfg = load_sources_yaml(spark, _write(tmp_path, YAML_TEXT))
    rows = {r.name: r for r in cfg.sources.collect()}
    assert set(rows) == {"babysteps", "newsline", "minimal"}
    assert rows["babysteps"].max_articles == 3
    assert rows["babysteps"].rate_limit == 2
    assert rows["minimal"].max_articles == 50  # reference default
    assert rows["minimal"].enabled is True
    assert rows["newsline"].enabled is False
    q = {r.error for r in cfg.quarantine.collect()}
    assert len(q) == 3
    assert any("missing required field" in e for e in q)
    assert any("unknown source type" in e for e in q)
    assert any("not a mapping" in e for e in q)


def test_yaml_missing_file_quarantines(spark, tmp_path):
    cfg = load_sources_yaml(spark, str(tmp_path / "nope.yaml"))
    assert cfg.sources.count() == 0
    assert cfg.quarantine.count() == 1


def test_yaml_config_drives_reference_schedule(spark, tmp_path):
    """End-to-end: the YAML dimension gates the schedule — disabled sources
    drop out, max_articles caps successes per source."""
    from newsraag_crawler_spark.operators.frontier import reference_schedule

    cfg = load_sources_yaml(spark, _write(tmp_path, YAML_TEXT))
    dim = to_schedule_dim(cfg.sources)
    ids = {r.name: r.source_id for r in cfg.sources.collect()}
    cands = spark.createDataFrame(
        [
            (sid, name, r, f"https://{name}.example.com/a/{r}", f"T{r}", 900)
            for name, sid in ids.items()
            for r in range(10)
        ],
        "source_id int, source_name string, feed_rank int, url string, title string, content_len int",
    )
    sched = reference_schedule(cands, dim, None, min_content_len=500)
    fetched = sched.fetched.groupBy("source_id").agg(F.count("*").alias("n"))
    got = {r.source_id: r.n for r in fetched.collect()}
    # newsline disabled -> absent; babysteps capped at 3; minimal takes all 10
    assert ids["newsline"] not in got
    assert got[ids["babysteps"]] == 3
    assert got[ids["minimal"]] == 10


def test_source_id_collision_quarantined(spark, tmp_path):
    """Two distinct names hashing to the same source_id must not silently
    merge downstream — the later entry lands in quarantine (errors are
    data)."""
    from unittest.mock import patch

    import newsraag_crawler_spark.sources.config_loader as cl

    p = tmp_path / "s.yaml"
    p.write_text(
        "sources:\n"
        "  - {name: alpha, type: rss, url: 'https://a/feed'}\n"
        "  - {name: bravo, type: rss, url: 'https://b/feed'}\n"
    )
    with patch.object(cl, "portable_hash64_py", lambda s, salt="": 7):
        cfg = cl.load_sources_yaml(spark, str(p))
    assert cfg.sources.count() == 1
    errs = [r.error for r in cfg.quarantine.collect()]
    assert any("collision" in e for e in errs)
