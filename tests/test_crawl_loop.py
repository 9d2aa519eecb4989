"""Multi-wave crawl driver: link expansion, budget spill across waves,
kill-and-resume from snapshot lineage (M5)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from newsraag_crawler_spark.operators.wave import run_crawl
from newsraag_crawler_spark.storage.snapshot_store import SnapshotTable

N_ART = 200


def _seeds(spark, n=40):
    return spark.createDataFrame(
        [
            Row(
                url=f"https://host{i % 4}.example.com/articles/{i}",
                source_id=i % 4,
                feed_rank=i,
                score=0.9,
                wave=0,
            )
            for i in range(n)
        ]
    )


def _policies(spark):
    return spark.createDataFrame(
        [
            Row(host=f"host{i}.example.com", crawl_delay_s=1.0, per_wave_budget=15,
                robots_disallow=["/private"])
            for i in range(4)
        ]
    )


def _tables(spark, tmp, name):
    return {
        k: SnapshotTable(spark, str(tmp / name / k))
        for k in ("frontier", "corpus", "seen", "metrics")
    }


def test_multiwave_expansion_and_spill(spark, tmp_path):
    t = _tables(spark, tmp_path, "a")
    res = run_crawl(
        spark, _seeds(spark), _policies(spark), t,
        max_waves=4, links_per_page=2, n_articles=N_ART,
    )
    assert res["waves_run"] == 4
    corpus = t["corpus"].read()
    # each wave fetched something and no url was fetched twice
    per_wave = {r.wave: r["cnt"] for r in corpus.groupBy("wave").agg(F.count("*").alias("cnt")).collect()}
    assert set(per_wave) == {0, 1, 2, 3}
    assert corpus.count() == corpus.select("url").distinct().count()
    # budget respected every wave
    host_wave = (
        corpus.withColumn("host", F.regexp_extract("url", "https://([^/]+)/", 1))
        .groupBy("host", "wave").count()
    )
    assert host_wave.filter(F.col("count") > 15).count() == 0
    # metrics snapshot per wave
    assert t["metrics"].read().count() == 4


def test_kill_and_resume(spark, tmp_path):
    t = _tables(spark, tmp_path, "b")
    seeds, pol = _seeds(spark), _policies(spark)
    run_crawl(spark, seeds, pol, t, max_waves=2, links_per_page=2, n_articles=N_ART)
    mid_corpus = t["corpus"].read().count()
    mid_lineage = t["frontier"].current_lineage()
    assert mid_lineage["next_wave"] == 2

    # 'crash' happened here; a NEW driver resumes from the tables alone
    t2 = _tables(spark, tmp_path, "b")
    res = run_crawl(spark, seeds, pol, t2, max_waves=4, links_per_page=2, n_articles=N_ART)
    assert res["last_wave"] == 3
    corpus = t2["corpus"].read()
    assert corpus.count() > mid_corpus
    # resume did not refetch: still globally unique urls
    assert corpus.count() == corpus.select("url").distinct().count()
    waves = {r.wave for r in corpus.select("wave").distinct().collect()}
    assert waves == {0, 1, 2, 3}


def test_crash_mid_wave_resume_is_idempotent(spark, tmp_path):
    """A crash AFTER corpus/seen commits but BEFORE the frontier commit must
    not duplicate corpus rows on resume: run_crawl rolls orphaned snapshots
    back to the last completed wave (the frontier commit is the commit
    point)."""
    t = _tables(spark, tmp_path, "c")
    seeds, pol = _seeds(spark), _policies(spark)
    run_crawl(spark, seeds, pol, t, max_waves=2, links_per_page=2, n_articles=N_ART)
    assert t["frontier"].current_lineage()["next_wave"] == 2

    # simulate the torn wave-2 commit: corpus+seen+metrics landed, frontier
    # (the commit point) did not
    from newsraag_crawler_spark.operators.wave import run_scale_wave

    frontier = t["frontier"].read()
    out = run_scale_wave(
        frontier, pol, t["seen"].read(), wave=2, links_per_page=2, n_articles=N_ART
    )
    t["corpus"].append(out["corpus"], lineage={"wave": 2}, count_rows=True)
    t["seen"].append(out["seen_additions"], lineage={"wave": 2})
    t["metrics"].append(
        spark.createDataFrame([(2, 1)], "wave int, fetched long"),
        lineage={"wave": 2},
    )
    torn = t["corpus"].read().count()

    t2 = _tables(spark, tmp_path, "c")
    run_crawl(spark, seeds, pol, t2, max_waves=3, links_per_page=2, n_articles=N_ART)
    corpus = t2["corpus"].read()
    # the orphaned wave-2 snapshot was rolled back, wave 2 re-ran exactly once
    assert corpus.count() <= torn
    assert corpus.count() == corpus.select("url").distinct().count()
    assert corpus.filter(F.col("wave") == 2).count() > 0
    dup_by_wave = (
        corpus.groupBy("url").count().filter(F.col("count") > 1).count()
    )
    assert dup_by_wave == 0


def test_discover_links_resolves_relative_and_caps(spark):
    """S6: real urljoin semantics (dot-segments, sibling-relative paths),
    order-preserving within-page dedup, per-page cap."""
    from pyspark.sql import Row

    from newsraag_crawler_spark.operators.wave import discover_links

    html = (
        '<a href="../news/up.html">a</a>'      # parent-relative, keep
        '<a href="contact.html">b</a>'          # sibling-relative, not article
        '<a href="/news/abs">c</a>'
        '<a href="../news/up.html">dup</a>'
        '<a href="https://x.example.org/article/z">d</a>'
        '<a href="/assets/p.jpg">skip</a>'
    )
    pages = spark.createDataFrame(
        [Row(url="https://h.example.com/section/index.html", html=html)]
    )
    out = discover_links(pages, max_links=2)
    got = [(r.link_pos, r.link) for r in out.orderBy("link_pos").collect()]
    # urljoin: '../news/up.html' against /section/index.html -> /news/up.html;
    # the dup at pos 3 is dropped, the cap keeps the first 2 article links
    assert got == [
        (0, "https://h.example.com/news/up.html"),
        (2, "https://h.example.com/news/abs"),
    ]


def test_no_cached_block_growth_across_waves(spark, tmp_path):
    """Each wave persists `due`; run_crawl must release it after the wave's
    commits — cached blocks accumulating across waves is the long-crawl
    memory leak (VERDICT r2 #5)."""
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    t = _tables(spark, tmp_path, "np")
    run_crawl(
        spark, _seeds(spark), _policies(spark), t,
        max_waves=3, links_per_page=2, n_articles=N_ART,
    )
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert after - before == set(), f"leaked persisted RDDs: {after - before}"
