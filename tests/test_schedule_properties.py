"""Property tests: reference_schedule == oracle on adversarial and random
worlds — exercising the cap/dup fixpoint coupling (SURVEY.md §7.3.1-2)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row

from newsraag_crawler_spark.operators.frontier import reference_schedule
from newsraag_crawler_spark.plans import oracle
from newsraag_crawler_spark.sources.synthetic import Candidate, SourceCfg

OK_LEN, SHORT_LEN = 500, 10


def _src(sid, cap, enabled=True):
    return SourceCfg(sid, f"s{sid}", f"https://h{sid}.x/feed", 1, cap, enabled)


def _cand(sid, rank, url, title="T", clen=OK_LEN, wave=0):
    return Candidate(sid, f"s{sid}", rank, url, title, clen, wave)


def _run_both(spark, sources, cands):
    from dataclasses import asdict

    exp = oracle.crawl_cycle(sources, cands, wave=0)
    src_df = spark.createDataFrame([Row(**asdict(s)) for s in sources])
    cand_df = spark.createDataFrame([Row(**asdict(c)) for c in cands])
    sched = reference_schedule(cand_df, src_df, None)
    got_order = [r.url for r in sched.fetched.orderBy("seq").select("url").collect()]
    got_seen = {r.key for r in sched.attempted.select("key").collect()}
    return (got_order, got_seen), (exp.order, exp.seen)


def test_capped_out_winner_promotes_to_later_source(spark):
    """A dup whose first occurrence was never reached (cap break) is NOT
    seen — the later source must fetch it (the fixpoint promotion case)."""
    sources = [_src(0, cap=1), _src(1, cap=5)]
    cands = [
        _cand(0, 0, "https://h.x/A"),
        _cand(0, 1, "https://h.x/B"),  # capped out in source 0, never seen
        _cand(1, 0, "https://h.x/B"),  # must be fetched here
    ]
    got, exp = _run_both(spark, sources, cands)
    assert exp[0] == ["https://h.x/A", "https://h.x/B"]  # oracle sanity
    assert got == exp


def test_failed_fetch_still_marks_seen(spark):
    """Dup-check marks seen BEFORE extraction: a short-content failure still
    blocks the same URL in a later source (duplicate_detector semantics)."""
    sources = [_src(0, cap=5), _src(1, cap=5)]
    cands = [
        _cand(0, 0, "https://h.x/C", clen=SHORT_LEN),  # failed but seen
        _cand(1, 0, "https://h.x/C"),  # skipped as duplicate
        _cand(1, 1, "https://h.x/D"),
    ]
    got, exp = _run_both(spark, sources, cands)
    assert exp[0] == ["https://h.x/D"]
    assert "https://h.x/C" in exp[1]
    assert got == exp


def test_chained_promotion(spark):
    """Two sources cap out on the same URL in sequence — promotion must
    cascade to the third (multi-iteration fixpoint)."""
    sources = [_src(0, cap=1), _src(1, cap=1), _src(2, cap=5)]
    cands = [
        _cand(0, 0, "https://h.x/A"),
        _cand(0, 1, "https://h.x/X"),  # capped in s0
        _cand(1, 0, "https://h.x/B"),
        _cand(1, 1, "https://h.x/X"),  # capped in s1 too
        _cand(2, 0, "https://h.x/X"),  # fetched here
    ]
    got, exp = _run_both(spark, sources, cands)
    assert exp[0][-1] == "https://h.x/X"
    assert got == exp


def test_deep_promotion_cascade_warns_but_stays_correct(spark):
    """Adversarial duplicate-across-capped-sources chain (r3 VERDICT #6):
    five cap=1 sources all listing X force a 4-pass fixpoint — the >3-pass
    runaway guard must WARN (each pass is a driver action) while the result
    still matches the sequential oracle exactly."""
    import warnings as _w

    sources = [_src(s, cap=1) for s in range(5)] + [_src(5, cap=5)]
    cands = []
    for s in range(5):
        cands.append(_cand(s, 0, f"https://h.x/fill{s}"))  # eats the cap
        cands.append(_cand(s, 1, "https://h.x/X"))  # capped out every time
    cands.append(_cand(5, 0, "https://h.x/X"))  # finally fetched here
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        got, exp = _run_both(spark, sources, cands)
    assert exp[0][-1] == "https://h.x/X"
    assert got == exp
    assert any("fixpoint pass" in str(r.message) for r in rec), (
        "expected the >3-pass guard to warn"
    )


@pytest.mark.parametrize("world_seed", [1, 2, 3, 4, 5])
def test_random_worlds_match_oracle(spark, world_seed):
    rng = random.Random(world_seed)
    n_sources = rng.randint(2, 4)
    sources = [
        _src(s, cap=rng.randint(1, 4), enabled=(rng.random() > 0.15))
        for s in range(n_sources)
    ]
    pool = [f"https://h{i % 3}.x/a/{i}" for i in range(8)]  # heavy collisions
    cands = []
    for s in range(n_sources):
        for r in range(rng.randint(3, 8)):
            cands.append(
                _cand(
                    s,
                    r,
                    rng.choice(pool),
                    title=None if rng.random() < 0.15 else "T",
                    clen=SHORT_LEN if rng.random() < 0.25 else OK_LEN,
                )
            )
    got, exp = _run_both(spark, sources, cands)
    assert got == exp, f"seed={world_seed}"
