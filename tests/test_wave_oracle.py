"""M2 parity: the Spark equivalence-mode wave must match the pure-Python
reference oracle — crawl order, seen-set membership, and per-row payloads
(caption exact, pixels PSNR>=40dB) — across waves and at any parallelism.
(SURVEY.md §5; FIXTURES.md §5-6.)"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from newsraag_crawler_spark.functions.images import decode_image, psnr
from newsraag_crawler_spark.operators.frontier import reference_schedule
from newsraag_crawler_spark.operators.wave import fetch_images, run_equivalence_cycle
from newsraag_crawler_spark.plans import oracle
from newsraag_crawler_spark.sources.synthetic import fixture_world
from newsraag_crawler_spark.storage.snapshot_store import SnapshotTable

SEED = 42


@pytest.fixture(scope="module")
def world():
    return fixture_world(seed=SEED, n_sources=6, urls_per_source=60, n_waves=2)


def _dfs(spark, world):
    from dataclasses import asdict

    from pyspark.sql import Row

    sources, candidates, policies = world
    src_df = spark.createDataFrame([Row(**asdict(s)) for s in sources])
    cand_df = spark.createDataFrame([Row(**asdict(c)) for c in candidates])
    return src_df, cand_df


def test_schedule_matches_oracle_wave0(spark, world):
    sources, candidates, _ = world
    src_df, cand_df = _dfs(spark, world)
    expected = oracle.crawl_cycle(sources, candidates, wave=0)

    sched = reference_schedule(cand_df.filter(F.col("wave") == 0), src_df, None)
    got_order = [
        r.url for r in sched.fetched.orderBy("seq").select("url").collect()
    ]
    assert got_order == expected.order
    got_seen = {r.key for r in sched.attempted.select("key").collect()}
    assert got_seen == expected.seen


def test_schedule_parallelism_invariant(spark, world):
    """Same membership+order when the input arrives in shuffled partitions:
    the order key is data-derived, never partition-derived (SURVEY §7.3.1)."""
    sources, candidates, _ = world
    src_df, cand_df = _dfs(spark, world)
    expected = oracle.crawl_cycle(sources, candidates, wave=0)
    shuffled = (
        cand_df.filter(F.col("wave") == 0)
        .repartition(7, F.col("url"))
        .sortWithinPartitions("content_len")
    )
    sched = reference_schedule(shuffled, src_df, None)
    got = [r.url for r in sched.fetched.orderBy("seq").select("url").collect()]
    assert got == expected.order


def test_two_wave_cycle_with_persistence(spark, world, tmp_path):
    sources, candidates, _ = world
    src_df, cand_df = _dfs(spark, world)
    seen_t = SnapshotTable(spark, str(tmp_path / "seen"))
    corpus_t = SnapshotTable(spark, str(tmp_path / "corpus"))

    # wave 0
    res0 = run_equivalence_cycle(cand_df, src_df, seen_t, corpus_t, wave=0, seed=SEED)
    exp0 = oracle.crawl_cycle(sources, candidates, wave=0)
    # wave 1 consumes wave-0 seen set
    res1 = run_equivalence_cycle(cand_df, src_df, seen_t, corpus_t, wave=1, seed=SEED)
    exp1 = oracle.crawl_cycle(sources, candidates, wave=1, seen=exp0.seen)

    got_order1 = [
        r.url
        for r in corpus_t.read()
        .filter(F.col("wave") == 1)
        .orderBy("seq")
        .select("url")
        .collect()
    ]
    assert got_order1 == exp1.order

    got_seen = {r.key for r in seen_t.read().collect()}
    assert got_seen == exp1.seen

    # cross-wave re-listing actually occurred (edge case is exercised)
    w0 = {c.url for c in exp0.fetched}
    w1_cands = {c.url for c in candidates if c.wave == 1}
    assert w0 & w1_cands, "fixture must re-list wave-0 URLs in wave 1"
    assert not (set(exp1.order) & w0), "re-listed URLs must be skipped in wave 1"
    assert res0.stats.count() > 0 and res1.stats.count() > 0


def test_per_row_payload_equality(spark, world, tmp_path):
    """input_hint per-row invariant: caption exact; decoded pixels
    PSNR>=40dB (exact for png) vs the oracle's independently generated rows."""
    sources, candidates, _ = world
    src_df, cand_df = _dfs(spark, world)
    res = run_equivalence_cycle(cand_df, src_df, None, None, wave=0, seed=SEED)
    exp = oracle.crawl_cycle(sources, candidates, wave=0)
    exp_rows = {r["url"]: r for r in oracle.expected_rows(exp, seed=SEED)}

    got = res.fetched.select(
        "url", "image_id", "bytes", "fmt", "caption", "phash", "w", "h"
    ).collect()
    assert len(got) == len(exp_rows)
    n_jpeg = 0
    for r in got:
        e = exp_rows[r.url]
        assert r.caption == e["caption"], r.url  # exact caption equality
        assert r.image_id == e["image_id"]
        assert r.phash == e["phash"]
        a = decode_image(bytes(r.bytes), r.fmt)
        b = decode_image(e["bytes"], e["fmt"])
        p = psnr(a, b)
        if r.fmt == "png":
            assert np.array_equal(a, b), r.url  # lossless → exact
        else:
            n_jpeg += 1
            assert p >= 40.0, (r.url, p)
    assert n_jpeg > 0, "fixture must exercise the lossy comparator path"


def test_canonical_mode_collapses_variants(spark, world):
    """Canonical (SURT) dedup collapses case/slash/query variants that the
    reference's raw-URL dedup does not (FIXTURES.md §3)."""
    sources, candidates, _ = world
    src_df, cand_df = _dfs(spark, world)
    exp_raw = oracle.crawl_cycle(sources, candidates, wave=0, canonical=False)
    exp_canon = oracle.crawl_cycle(sources, candidates, wave=0, canonical=True)
    assert len(exp_canon.order) <= len(exp_raw.order)

    sched = reference_schedule(
        cand_df.filter(F.col("wave") == 0), src_df, None, canonical=True
    )
    got = [r.url for r in sched.fetched.orderBy("seq").select("url").collect()]
    assert got == exp_canon.order


def test_fetch_deterministic_across_runs(spark, world):
    sources, candidates, _ = world
    src_df, cand_df = _dfs(spark, world)
    sched = reference_schedule(cand_df.filter(F.col("wave") == 0), src_df, None)
    a = fetch_images(sched.fetched, seed=SEED).select("url", "image_id", "phash")
    b = fetch_images(sched.fetched, seed=SEED).select("url", "image_id", "phash")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
