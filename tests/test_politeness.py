"""Politeness: robots filter, budget waves, spill, skew census + salting."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from newsraag_crawler_spark.operators.frontier import priority_frontier
from newsraag_crawler_spark.operators.politeness import (
    apply_robots,
    budget_waves,
    salt_hot_hosts,
    skew_census,
    split_wave,
)


def _frontier(spark):
    rows = [
        Row(url=f"https://a.com/articles/{i}", host="a.com", path=f"/articles/{i}",
            score=float(i % 5), discovery_rank=i)
        for i in range(20)
    ]
    rows.append(
        Row(url="https://a.com/private/1", host="a.com", path="/private/1",
            score=9.0, discovery_rank=99)
    )
    rows += [
        Row(url=f"https://b.com/articles/{i}", host="b.com", path=f"/articles/{i}",
            score=1.0, discovery_rank=i)
        for i in range(3)
    ]
    return spark.createDataFrame(rows)


def _policies(spark):
    return spark.createDataFrame(
        [
            Row(host="a.com", crawl_delay_s=2.0, per_wave_budget=6,
                robots_disallow=["/private"]),
            Row(host="b.com", crawl_delay_s=1.0, per_wave_budget=50,
                robots_disallow=[]),
        ]
    )


def test_robots_blocks_disallowed(spark):
    f, p = _frontier(spark), _policies(spark)
    allowed, blocked = apply_robots(f, p)
    assert blocked.count() == 1
    assert blocked.first().path == "/private/1"
    assert allowed.filter(F.col("path").startswith("/private")).count() == 0


def test_budget_waves_and_spill(spark):
    f, p = _frontier(spark), _policies(spark)
    allowed, _ = apply_robots(f, p)
    ranked = priority_frontier(allowed)
    budgeted = budget_waves(ranked, p)
    due, spill = split_wave(budgeted)
    a_due = due.filter(F.col("host") == "a.com")
    assert a_due.count() == 6  # budget binds
    assert spill.filter(F.col("host") == "a.com").count() == 20 - 6
    # priority: the 6 due rows are the best (score desc, rank asc)
    got = {r.url for r in a_due.collect()}
    rows = sorted(
        [r for r in allowed.filter(F.col("host") == "a.com").collect()],
        key=lambda r: (-r.score, r.discovery_rank),
    )[:6]
    assert got == {r.url for r in rows}
    # schedule offsets: rank r in wave ⇒ (r-1)*delay
    offs = sorted(r.scheduled_at_s for r in a_due.collect())
    assert offs == [0.0, 2.0, 4.0, 6.0, 8.0, 10.0]


def test_wave_offsets_cover_all_rows(spark):
    f, p = _frontier(spark), _policies(spark)
    allowed, _ = apply_robots(f, p)
    budgeted = budget_waves(priority_frontier(allowed), p)
    per_wave = budgeted.filter(F.col("host") == "a.com").groupBy("wave_offset").count()
    rows = {r.wave_offset: r["count"] for r in per_wave.collect()}
    assert rows == {0: 6, 1: 6, 2: 6, 3: 2}


def test_skew_census_and_salting(spark):
    f, p = _frontier(spark), _policies(spark)
    allowed, _ = apply_robots(f, p)
    due, _ = split_wave(budget_waves(priority_frontier(allowed), p))
    census = skew_census(due, threshold=4)
    hot = {r.host: r.n_salts for r in census.collect()}
    assert "a.com" in hot and hot["a.com"] >= 2
    salted = salt_hot_hosts(due, census)
    a_keys = {r.fetch_key for r in salted.filter(F.col("host") == "a.com").collect()}
    assert len(a_keys) > 1 and all("#" in k for k in a_keys)
    b_keys = {r.fetch_key for r in salted.filter(F.col("host") == "b.com").collect()}
    assert b_keys == {"b.com"}  # cold host untouched


def test_retry_schedule_waves(spark):
    """R3/R4: failures re-enter with attempt+1, progressive timeouts, and
    die after max_attempts; successes leave the loop."""
    from newsraag_crawler_spark.operators.politeness import retry_schedule

    rows = [
        Row(url=f"https://a.com/{i}", attempt=0, success=(i % 3 == 0)) for i in range(9)
    ]
    df = spark.createDataFrame(rows)
    ok, retry, dead = retry_schedule(df)
    assert ok.count() == 3
    assert dead.count() == 0
    r1 = retry.collect()
    assert all(r.attempt == 1 and r.timeout_s == 60 and r.backoff_s == 2.0 for r in r1)

    # second failure round
    df2 = retry.withColumn("success", F.lit(False)).select("url", "attempt", "success")
    ok2, retry2, dead2 = retry_schedule(df2)
    assert ok2.count() == 0 and dead2.count() == 0
    assert all(r.attempt == 2 and r.timeout_s == 120 for r in retry2.collect())

    # third: exhausted
    df3 = retry2.withColumn("success", F.lit(False)).select("url", "attempt", "success")
    ok3, retry3, dead3 = retry_schedule(df3)
    assert retry3.count() == 0
    assert dead3.count() == 6


def test_token_budget_gate_refuses_past_limits(spark):
    """F6/A5: the gate mirrors token_tracker.can_make_request — refusal when
    the running daily OR monthly counter would exceed its limit."""
    from newsraag_crawler_spark.operators.stats import token_budget_gate

    rows = [
        # (event_id, ts, tokens): day 1 usage 60+60+60 under daily=150 until
        # the third (180 > 150); month cap 300 refuses day-2's second row
        # (180 spent in-month + 100 + 100 = 380 > 300)
        (1, "2024-01-01 08:00:00", 60),
        (2, "2024-01-01 09:00:00", 60),
        (3, "2024-01-01 10:00:00", 60),
        (4, "2024-01-02 08:00:00", 100),
        (5, "2024-01-02 09:00:00", 100),
    ]
    df = spark.createDataFrame(rows, "event_id int, ts string, tokens long").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = token_budget_gate(
        df, "ts", "tokens", "event_id", daily_limit=150, monthly_limit=300
    )
    got = {r.event_id: r.allowed for r in out.collect()}
    assert got == {1: True, 2: True, 3: False, 4: True, 5: False}


def test_newest_first_unparseable_sorts_last(spark):
    from newsraag_crawler_spark.operators.frontier import newest_first

    rows = [
        (1, "s", "2024-05-01", 1),
        (2, "s", None, 2),  # unparseable → datetime.min → last
        (3, "s", "2024-06-01", 3),
    ]
    df = spark.createDataFrame(rows, "id int, source_id string, d string, feed_rank int")
    df = df.withColumn("d", F.col("d").cast("date"))
    out = newest_first(df, "d", group_col="source_id", tiebreak_col="feed_rank")
    order = [r.id for r in out.orderBy("order_rank").collect()]
    assert order == [3, 1, 2]


def test_parse_robots_composes_with_apply_robots(spark):
    """robots.txt BODY → parse_robots → apply_robots: the parsed wildcard
    rules must block exactly the disallowed prefixes, honor the other-agent
    section being first, treat empty Disallow as allow-all, and default the
    crawl delay when absent."""
    from pyspark.sql import Row

    from newsraag_crawler_spark.operators.politeness import apply_robots, parse_robots

    bodies = spark.createDataFrame(
        [
            Row(host="a.com", robots_txt=(
                "User-agent: badbot\nDisallow: /\n"
                "User-agent: *\nDisallow: /private\nCrawl-delay: 3.5")),
            Row(host="b.com", robots_txt="User-agent: *\nDisallow:\n"),
            Row(host="c.com", robots_txt=None),
        ]
    )
    pol = parse_robots(bodies)
    got = {r.host: r for r in pol.collect()}
    assert got["a.com"].robots_disallow == ["/private"]
    assert got["a.com"].crawl_delay_s == 3.5
    assert got["b.com"].robots_disallow == [] and got["b.com"].crawl_delay_s == 1.0
    assert got["c.com"].robots_disallow == []

    frontier = spark.createDataFrame(
        [
            Row(host="a.com", path="/private/x", url="https://a.com/private/x"),
            Row(host="a.com", path="/articles/1", url="https://a.com/articles/1"),
            Row(host="b.com", path="/anything", url="https://b.com/anything"),
        ]
    )
    allowed, blocked = apply_robots(frontier, pol)
    assert {r.url for r in blocked.collect()} == {"https://a.com/private/x"}
    assert {r.url for r in allowed.collect()} == {
        "https://a.com/articles/1", "https://b.com/anything"}


def test_parse_robots_hostile_bodies(spark):
    """r4 ADVICE regressions: '@' in a comment must NOT truncate the
    wildcard section (the old '@'-sentinel bug); '#'-comments are stripped
    per spec; a malformed Crawl-delay (1.2.3) falls back to the default
    instead of casting to NULL; a pre-existing sentinel byte is stripped."""
    from pyspark.sql import Row

    from newsraag_crawler_spark.operators.politeness import parse_robots

    bodies = spark.createDataFrame(
        [
            # '@' in a comment BEFORE the rules it used to truncate
            Row(host="at.com", robots_txt=(
                "# webmaster: ops@at.com\n"
                "User-agent: *\n"
                "Disallow: /a  # '@' again: x@y\n"
                "Disallow: /b\n"
                "Crawl-delay: 2.5\n")),
            # malformed delay → default, not NULL
            Row(host="bad.com", robots_txt=(
                "User-agent: *\nDisallow: /x\nCrawl-delay: 1.2.3\n")),
            Row(host="dot.com", robots_txt=(
                "User-agent: *\nCrawl-delay: .\n")),
            # hostile pre-existing sentinel byte is stripped, not honored
            Row(host="ctl.com", robots_txt=(
                "\x01 *\nDisallow: /evil\n"
                "User-agent: *\nDisallow: /real\n")),
        ]
    )
    got = {r.host: r for r in parse_robots(bodies).collect()}
    assert got["at.com"].robots_disallow == ["/a", "/b"]
    assert got["at.com"].crawl_delay_s == 2.5
    assert got["bad.com"].robots_disallow == ["/x"]
    assert got["bad.com"].crawl_delay_s == 1.0
    assert got["dot.com"].crawl_delay_s == 1.0
    assert got["ctl.com"].robots_disallow == ["/real"]
