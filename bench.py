"""Benchmark harness (driver-run per round).

Headline metric (BASELINE.json): URLs fetched+deduped per second through the
full scale-mode crawl wave — canonicalize → Bloom+exact seen filter →
priority frontier → politeness budgets → hot-host salting → deterministic
image fetch — on a distributed synthetic frontier (no driver-side data).

Scaling evidence (north rule, sandbox form): the same wave runs at
local[N_SMALL] and local[N_BIG] on the same input; we report throughput at
both and efficiency = (T_big/T_small)/(N_big/N_small), and write
BENCH/BASELINE.md. Per-query timings over $SPARK_GRAFT_SF_DIR follow.

Output protocol (r3 VERDICT #1 — the r3 run timed out leaving ZERO
evidence): work is ordered headline → per-query → pinned scaling pairs →
soak → unpinned secondary, a flushed ``{"partial": ...}`` JSON line is
printed the moment each piece lands, and the complete combined JSON is the
LAST line. A SPARK_GRAFT_BENCH_BUDGET_S wall budget (default 1620 s; r1/r2
driver runs completed at ~26 min, so ~27 min of work is known-safe) stops
scheduling new scaling pairs / the soak / the unpinned run when the next
piece would overrun, so a driver timeout can only truncate the
lowest-priority tail.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_URLS (default 1000000),
SPARK_GRAFT_PIN_URLS / SPARK_GRAFT_PIN_PAIRS (600000 / 3),
SPARK_GRAFT_BENCH_BUDGET_S (1620), SPARK_GRAFT_SCALING=0 to skip scaling,
SPARK_GRAFT_SOAK=0 to skip the multi-wave soak.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# large enough that per-row (linearly scaling) work dominates the fixed
# ~30s of job/stage scheduling — the scaling-efficiency measurement needs
# the parallel fraction to dwarf the constant part (Amdahl)
N_URLS = int(os.environ.get("SPARK_GRAFT_BENCH_URLS", "1000000"))
# unpinned local[N] wall times on this shared box swing up to 3× run-to-run
# (python workers outside the task slots + GC jitter); report the MEDIAN of
# this many repeats per measurement. Pinned (taskset) runs are stable.
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
N_SMALL = max(CPUS // 4, 2)
RUN_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") == "1"
RUN_SOAK = os.environ.get("SPARK_GRAFT_SOAK", "1") == "1"
BUDGET_S = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "1620"))
_T_START = time.time()


def _cpu_probe_ms() -> float:
    """Fixed-work CPU probe: wall time of a constant numpy matmul loop.
    External tenants on a shared box do NOT show in this cgroup's loadavg
    but DO show here (the same code measured 2.6x apart across windows in
    r5 — BENCH/NOTES.md), so every partial carries the probe, letting a
    reader normalize absolute throughputs across box-state windows. The
    pair-ratio scaling protocol needs no such correction; this is for
    interpreting the unpinned headline/per-query numbers."""
    import numpy as np

    a = np.arange(512 * 512, dtype=np.float64).reshape(512, 512) / 1e6
    t0 = time.perf_counter()
    for _ in range(4):
        (a @ a).sum()
    return round((time.perf_counter() - t0) * 1000, 1)


def _emit(kind: str, payload: dict) -> None:
    """Flushed partial-result line: a driver timeout still leaves every
    completed measurement parsable in its captured tail."""
    print(
        json.dumps(
            {
                "partial": kind,
                "at_s": round(time.time() - _T_START, 1),
                "cpu_probe_ms": _cpu_probe_ms(),
                **payload,
            }
        ),
        flush=True,
    )


def _left() -> float:
    return BUDGET_S - (time.time() - _T_START)

BENCH_QUERIES = [
    "tpch_q1_pricing_summary",
    "url_canonicalize",
    "seen_antijoin",
    "per_source_cap",
    "robots_parse",
    "reference_schedule",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_winnowing",
    "simhash_fingerprint",
    "text_quality",
    "ann_cosine_topk",
    "srp_ann_topk",
    "ivf_ann_topk",
    "ivf_kmeans_topk",
    "kmeans_clusters",
    "dedup_embedding_cosine",
    "phash_hamming_pairs",
    "bloom_seen_filter",
    "cuckoo_seen_filter",
    "fuzzy_date_parse",
    "html_text_extract",
    "token_budget_gate",
    "fetch_metadata",
    "rss_items_parse",
    "extraction_fallback",
    "crawl_embedding_neardup",
    "dup_detector_stats",
]


def _fresh_session(cpus: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    from newsraag_crawler_spark.session import build_session

    # reuse=false: a reused pandas-UDF daemon bloats in proportion to the
    # payload volume IT streams, and that volume per daemon is inversely
    # proportional to the core count — a systematic handicap on the SMALL
    # side of a scaling pair (2 daemons stream 4x what 8 do). Fresh workers
    # pay a flat ~50ms/task spawn tax on both sides instead — fair.
    reuse = os.environ.get("SPARK_GRAFT_WORKER_REUSE", "false")
    return build_session(
        f"bench_{cpus}", cpus=cpus,
        extra_conf={"spark.python.worker.reuse": reuse},
    )


def crawl_wave_bench(spark, n_urls: int) -> tuple[int, float]:
    """One timed scale-mode wave: returns (urls_fetched+deduped, seconds).

    The timed span covers the whole dataflow to materialization via a single
    count() action (no intermediate actions that would recompute the DAG).
    Seen set = 25% of the url space, pre-built as Bloom shards + exact table
    (build time excluded — it is the durable state of previous waves).
    """
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from newsraag_crawler_spark.functions.urlnorm import surt_url
    from newsraag_crawler_spark.operators.dedup import build_bloom_shards, seen_filter_two_phase
    from newsraag_crawler_spark.operators.frontier import priority_frontier
    from newsraag_crawler_spark.operators.politeness import (
        budget_waves,
        salt_hot_hosts,
        skew_census,
        split_wave,
    )
    from newsraag_crawler_spark.operators.wave import fetch_images
    from newsraag_crawler_spark.sources.synthetic import synth_frontier_df

    t_setup = time.time()
    n_hosts = max(n_urls // 100, 10)
    # CONSTANT data-derived input partitioning (same formula as the fetch
    # repartition below): defaultParallelism*2 would hand different input
    # partition counts to different core counts, changing per-task overhead
    # and Arrow batch sizes between the scaling measurement's two sides
    frontier = synth_frontier_df(
        spark, n_urls, n_hosts=n_hosts, hot_host_pct=20,
        partitions=max(128, n_urls // 12_500) if n_urls >= 100_000 else 16,
    )
    policies = spark.createDataFrame(
        [Row(host="host0.example.com", crawl_delay_s=1.0, per_wave_budget=2000,
             robots_disallow=["/private"])]
    )
    # durable seen state from "previous waves": every 4th article id
    seen = (
        frontier.filter(F.pmod(F.xxhash64("url"), F.lit(4)) == 0)
        .select(surt_url(F.col("url")).alias("key"))
    )
    # bloom sizing follows the input (~10 bits/key at 25% seen) so WARMUP
    # waves (n/50) don't pay the measured configuration's fixed 64×2^22
    # build; every MEASURED size (>=100k) keeps the identical 64-shard
    # 2^22 geometry as prior rounds
    if n_urls >= 100_000:
        n_shards, n_bits, n_hashes = 64, 1 << 22, 5
    else:
        n_shards, n_bits, n_hashes = 16, 1 << 16, 5
    shards = build_bloom_shards(seen, n_shards=n_shards, n_bits=n_bits, n_hashes=n_hashes)
    shards = shards.persist()
    seen = seen.persist()
    shards.count(), seen.count()  # materialize state outside the timed span
    print(f"# state_build_s={time.time() - t_setup:.1f} n={n_urls}",
          file=sys.stderr, flush=True)

    t0 = time.time()
    # canonicalize ONCE and materialize: every downstream reference to the
    # key (bloom positions, shard routing, joins) would otherwise inline the
    # full regex normalization tree per reference (observed ~7× JVM cost)
    f = frontier.withColumn("surt_url", surt_url(F.col("url"))).withColumn(
        "path",
        F.regexp_extract(F.col("url"), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
    ).localCheckpoint(eager=True)
    fresh = seen_filter_two_phase(
        f.withColumnRenamed("surt_url", "key"), seen, shards,
        n_shards=n_shards, n_bits=n_bits, n_hashes=n_hashes,
    ).withColumnRenamed("key", "surt_url")
    # EXPLICIT host exchange feeding the ranking window: AQE coalesces this
    # byte-small shuffle down to defaultParallelism-derived counts (measured
    # 9 partitions at local[8] — straggler rounds in the window sort, and a
    # geometry that CHANGES with core count, which a scaling measurement
    # must not allow). The window's ClusteredDistribution(host) is satisfied
    # by the explicit hash partitioning, so no second exchange is added.
    n_rank_parts = max(128, n_urls // 12_500) if n_urls >= 100_000 else 16
    ranked = priority_frontier(
        fresh.repartition(n_rank_parts, F.col("host")), rank_col="feed_rank"
    )
    budgeted = budget_waves(ranked, policies, default_budget=200, default_delay_s=1.0)
    due, _spill = split_wave(budgeted)
    # census, salt and fetch all consume `due` — materialize it ONCE with a
    # lineage-truncating checkpoint, then RELEASE every upstream block
    # (frontier checkpoint, seen table, bloom shards) BEFORE the payload
    # stage: resident long-lived blocks measured a 2.4x slowdown of the
    # Arrow-heavy fetch (49s clean vs 117s loaded at 600k rows — the 11 GB
    # of corpus rows streaming through the JVM makes GC scan/copy whatever
    # else lives in the heap). Well-structured production waves get the
    # same effect by committing `due` to the table before fetching.
    pre_ids = {
        jrdd.id()
        for jrdd in frontier.sparkSession.sparkContext._jsc.getPersistentRDDs().values()
    }
    due = due.localCheckpoint(eager=True)
    for jrdd in list(
        frontier.sparkSession.sparkContext._jsc.getPersistentRDDs().values()
    ):
        if jrdd.id() in pre_ids:
            jrdd.unpersist(True)
    census = skew_census(due, threshold=5000)
    salted = salt_hot_hosts(due, census)
    # explicit partition count: AQE would coalesce the byte-small pre-fetch
    # shuffle to 1 partition and serialize the codec-heavy fetch UDF.
    # CONSTANT (data-sized, ~10-50k rows/task), NOT parallelism-derived: a
    # scaling measurement must hold the partitioning fixed while varying
    # cores — dp*4 handed the small run 4x-larger Arrow batches (less
    # per-task overhead) and understated efficiency; on a real cluster the
    # partition count follows the data volume, not the executor count
    # >= 4 tasks per slot at the widest config (local[32]) so the wave time
    # is not bound by one straggler partition under host skew; still
    # data-derived and IDENTICAL at every parallelism level
    # small-n (warmup) waves drop to 16 partitions: 128 near-empty tasks ×
    # several stages on a 2-core pinned run is ~50 s of pure task overhead;
    # every MEASURED size (>=100k) keeps the identical 128+ geometry
    n_parts = max(128, n_urls // 12_500) if n_urls >= 100_000 else 16
    scheduled = (
        salted.repartition(n_parts, F.col("fetch_key"))
        .withColumn("source_name", F.concat(F.lit("src"), F.col("source_id").cast("string")))
        .withColumn("seq", F.col("host_rank").cast("long"))
    )
    corpus = fetch_images(scheduled, seed=42, wave=0)
    # materialize via a WRITE, not count(): the fetch codec is a projected
    # (nondeterministic) pandas-UDF column, and a count() plan needs no
    # columns, so Catalyst column-prunes the codec away — a counted "wave"
    # would skip the payload work entirely. The noop sink consumes full
    # rows (bytes included) like the production parquet commit, minus IO.
    corpus.write.format("noop").mode("overwrite").save()
    elapsed = time.time() - t0
    # row count from the already-checkpointed `due` (fetch is 1:1), outside
    # the timed span and without re-running anything expensive
    n = due.count()
    seen.unpersist()
    shards.unpersist()
    return n, elapsed


def run_queries(spark, sf_dir: str) -> tuple[dict[str, float], dict[str, float]]:
    """Returns (first_run, steady) wall times per query. The first run
    carries one-time Catalyst analysis + whole-stage-codegen compile —
    measured 6-13 s on the widest expression trees (lang-ID case chains,
    simhash bit votes) vs ~3 s steady — which a 100 TB job amortizes to
    nothing; both are published so the table is honest about each."""
    from newsraag_crawler_spark.queries import catalog

    cat = catalog()
    first: dict[str, float] = {}
    steady: dict[str, float] = {}
    # warm the noop sink + codegen paths so the first timed query isn't
    # charged for one-time JVM setup
    spark.range(100).write.format("noop").mode("overwrite").save()
    # warm parquet footers/page cache: metadata-only counts — the first
    # timed query otherwise absorbs every table's cold first-touch IO
    import glob as _glob

    for pq in sorted(_glob.glob(f"{sf_dir}/*.parquet")):
        spark.read.parquet(pq).count()
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = cat[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        first[name] = round(time.time() - t0, 3)
        t0 = time.time()
        cat[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        steady[name] = round(time.time() - t0, 3)
    return first, steady


def _wave_subprocess(
    cpus: int,
    n_urls: int,
    pin: int | None = None,
    repeats: int = 1,
    in_process: bool = False,
) -> tuple[int, float]:
    """Run timed wave(s) in a FRESH OS process: back-to-back sessions in
    one process interfere (lingering python daemons, allocator state) and
    add 50%+ run-to-run variance.

    pin: limit the WHOLE process tree (JVM + python workers) to that many
    physical cores via taskset — models a cluster executor's dedicated-core
    budget, which plain local[N] does not (python workers are extra
    processes outside the N task slots).

    repeats: number of measured waves; MEDIAN elapsed is returned.
    in_process=False runs each repeat in its own fresh process (fresh JVM +
    python daemons) — required when comparing runs AGAINST EACH OTHER (the
    scaling pairs). in_process=True runs all repeats inside ONE fresh
    subprocess (--wave mode: untimed warmup, then per-run eager-checkpoint
    block release) — safe for the headline because reuse=false already
    prevents the worker-bloat degradation (the 19s→33s→61s wave decay was
    reuse=TRUE daemons bloating on payload), and it amortizes the ~90 s
    JVM+warmup+state tax once instead of per repeat.
    """
    import shutil
    import subprocess

    inproc = repeats if in_process else 1
    cmd = [
        sys.executable, os.path.abspath(__file__),
        "--wave", str(cpus), str(n_urls), str(inproc),
    ]
    if pin and shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{pin - 1}"] + cmd
    times = []
    for _ in range(1 if in_process else repeats):
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        d = json.loads(line)
        times.append(d["elapsed"])
    times.sort()
    return d["fetched"], times[len(times) // 2]


def _pinned_scaling(n_pin: int, pairs: int) -> dict:
    """Interleaved A/B/A/B pinned measurement (r2 VERDICT #2: all-A-then-
    all-B lands any shared-box load shift entirely on one side, which made
    the same code read 1.078 one run and 0.633 the next).

    Each pair = one fresh-process 2-core wave immediately followed by one
    fresh-process 8-core wave; the pair's efficiency (thr_8/thr_2)/4 cancels
    slow drift because both sides of a pair see near-identical box
    conditions. Reports the median pair efficiency AND the full per-pair
    spread — a single number without its spread is how r2 published a bogus
    figure.

    Budget-aware (r3 VERDICT #1): each completed pair is _emit()ted
    immediately, and a further pair is only started while the projected
    pair cost (last pair × 1.15) fits the remaining wall budget — a driver
    timeout can cost at most the pair in flight, never completed evidence.
    """
    small_t, big_t, effs = [], [], []
    n_small_rows = n_big_rows = 0
    # Once TWO pairs are in hand the gate has a conservative median, so
    # further pairs must also leave room for the soak (r4: the driver run
    # fit 3 pairs exactly and then skipped the soak — the one artifact the
    # r4 VERDICT asked for; 2 pairs + soak beats 3 pairs + no soak).
    soak_reserve = 180.0 if RUN_SOAK else 0.0
    for i in range(pairs):
        if small_t:
            est = (small_t[-1] + big_t[-1]) * 1.15 + 60  # + JVM/warmup tax
            if len(effs) >= 2:
                est += soak_reserve
            if est > _left():
                _emit("pin_budget_stop", {"pairs_done": len(effs),
                                          "est_next_s": round(est, 1),
                                          "left_s": round(_left(), 1)})
                break
        n_small_rows, ts = _wave_subprocess(2, n_pin, pin=2, repeats=1)
        n_big_rows, tb = _wave_subprocess(8, n_pin, pin=8, repeats=1)
        eff = ((n_big_rows / tb) / (n_small_rows / ts)) / 4
        raw = None
        # pinned waves are stable ±3% on an idle box (measured r3), so an
        # out-of-band pair means one side was contaminated (contamination
        # only ever ADDS time). Re-measure BOTH sides and score each by
        # its MIN — the r4 one-sided rule re-ran only the implicated side,
        # which conditions re-measurement on the metric under test and
        # biases the published median toward the gate (r4 ADVICE); the
        # symmetric min-of-2 is bias-free. Raw values are published.
        if (eff < 0.80 or eff > 1.10) and (
            (ts + tb) * 1.15 + 60 + (soak_reserve if len(effs) >= 2 else 0.0)
        ) < _left():
            _, ts2 = _wave_subprocess(2, n_pin, pin=2, repeats=1)
            _, tb2 = _wave_subprocess(8, n_pin, pin=8, repeats=1)
            raw = {"t2_raw_s": [round(ts, 1), round(ts2, 1)],
                   "t8_raw_s": [round(tb, 1), round(tb2, 1)]}
            ts, tb = min(ts, ts2), min(tb, tb2)
            eff = ((n_big_rows / tb) / (n_small_rows / ts)) / 4
        small_t.append(ts)
        big_t.append(tb)
        effs.append(eff)
        _emit("pin_pair", {"i": i, "t2_s": round(ts, 1), "t8_s": round(tb, 1),
                           "efficiency": round(eff, 3),
                           **({"remeasured": raw} if raw else {})})
    # CONSERVATIVE median: even counts take the LOWER middle, so a
    # 2-pair run headline-reports the worse pair, never a >1 artifact
    effs_sorted = sorted(effs)
    med_eff = effs_sorted[(len(effs_sorted) - 1) // 2]
    ts_med = sorted(small_t)[(len(small_t) - 1) // 2]
    tb_med = sorted(big_t)[(len(big_t) - 1) // 2]
    return {
        "n_small_cores": 2,
        "n_big_cores": 8,
        "n_urls": n_pin,
        "pairs": len(effs),
        "urls_per_sec_small": round(n_small_rows / ts_med, 1),
        "urls_per_sec_big": round(n_big_rows / tb_med, 1),
        "scaling_efficiency": round(med_eff, 3),
        "efficiency_per_pair": [round(e, 3) for e in effs],
        "efficiency_min": round(min(effs), 3),
        "efficiency_max": round(max(effs), 3),
        "small_times_s": [round(t, 1) for t in small_t],
        "big_times_s": [round(t, 1) for t in big_t],
    }


def crawl_soak(spark, n_seeds: int = 120_000, waves: int = 5) -> dict:
    """Multi-wave soak (r3 VERDICT #8): run_crawl with link expansion over
    ``waves`` waves — the frontier grows from discovered links then drains
    through the seen filter — timing each wave via the resume path (one
    run_crawl(max_waves=1) per wave re-enters from the frontier table's
    lineage, exercising checkpoint-resume at bench scale) and recording the
    persistent-RDD block count after each wave: a flat count is the
    at-scale regression gate for the r2 cache leak (wave.py releases
    _due_cached per wave)."""
    import shutil
    import tempfile

    from pyspark.sql import Row

    from newsraag_crawler_spark.operators.wave import run_crawl
    from newsraag_crawler_spark.sources.synthetic import synth_frontier_df
    from newsraag_crawler_spark.storage.snapshot_store import SnapshotTable

    root = tempfile.mkdtemp(prefix="crawl_soak_")
    tables = {
        k: SnapshotTable(spark, os.path.join(root, k))
        for k in ("frontier", "corpus", "seen", "metrics")
    }
    seeds = synth_frontier_df(
        spark, n_seeds, n_hosts=max(n_seeds // 100, 10), hot_host_pct=20,
        partitions=max(32, n_seeds // 12_500),
    ).select("url", "source_id", "feed_rank", "score", "wave")
    policies = spark.createDataFrame(
        [Row(host="host0.example.com", crawl_delay_s=1.0, per_wave_budget=2000,
             robots_disallow=["/private"])]
    )
    wave_s, wave_rows, blocks = [], [], []
    try:
        for i in range(waves):
            t0 = time.time()
            # max_waves is an absolute wave NUMBER bound; i+1 makes each
            # resume call execute exactly one more wave from table lineage
            out = run_crawl(
                spark, seeds, policies, tables, max_waves=i + 1,
                links_per_page=2, n_articles=n_seeds,
            )
            wave_s.append(round(time.time() - t0, 2))
            if out["waves_run"] == 0:
                break
            lin = tables["corpus"].current_lineage() or {}
            wave_rows.append(int(lin.get("rows", 0)))
            blocks.append(
                len(spark.sparkContext._jsc.getPersistentRDDs())
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return {
        "n_seeds": n_seeds,
        "waves": len(wave_rows),
        "wave_seconds": wave_s,
        "wave_fetched": wave_rows,
        "wave_urls_per_sec": [
            round(r / s, 1) for r, s in zip(wave_rows, wave_s)
        ],
        "persistent_blocks_per_wave": blocks,
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--wave":
        cpus, n_urls = int(sys.argv[2]), int(sys.argv[3])
        repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 1
        spark = _fresh_session(cpus)
        # untimed warmup of the identical pipeline: JIT + whole-stage
        # codegen + python-worker spawn are one-time costs a long-running
        # cluster job amortizes away; the measurement is steady-state
        def _release_blocks():
            # the wave's eager localCheckpoints pin RDD blocks in the block
            # manager; without an explicit release they ACCUMULATE across
            # repeated waves in one session (measured: wave2 2x slower than
            # wave1 at 32 threads — GC pressure from dead checkpoint blocks).
            # A production multi-wave driver holds no reference either; this
            # makes the cleanup deterministic instead of ContextCleaner-timed.
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for jrdd in list(jmap.values()):
                jrdd.unpersist(True)

        crawl_wave_bench(spark, max(n_urls // 50, 5_000))
        _release_blocks()
        runs = []
        for _ in range(repeats):
            runs.append(crawl_wave_bench(spark, n_urls))
            _release_blocks()
        spark.stop()
        n = runs[0][0]
        times = sorted(dt for _, dt in runs)
        median = times[len(times) // 2]
        print(json.dumps({"fetched": n, "elapsed": median, "all_elapsed": times}))
        return

    # ---- 1. headline FIRST (the number of record must survive any timeout)
    # median of REPEATS in-process steady-state waves in one fresh process
    n_b, t_b = _wave_subprocess(CPUS, N_URLS, repeats=REPEATS, in_process=True)
    thr_b = n_b / t_b
    crawl = {"n_frontier_urls": N_URLS, "fetched": n_b, "elapsed_sec": round(t_b, 2)}
    _emit("crawl", {**crawl, "urls_per_sec": round(thr_b, 1)})

    # ---- 2. per-query wall times (first run incl. one-time plan/codegen
    # compile, plus steady-state — the 100 TB-relevant number)
    spark = _fresh_session(CPUS)
    qtimes, qsteady = run_queries(spark, SF_DIR)
    _emit("queries", {"queries": qtimes, "queries_steady": qsteady})
    spark.stop()

    # ---- 3. pinned scaling pairs (budget-aware, emitted per pair) — the
    # north-rule gate outranks the soak/unpinned extras below
    scaling = {}
    if RUN_SCALING:
        # primary north-rule evidence: IDENTICAL job at N and 4N CPU-PINNED
        # cores (taskset over the whole process tree = an executor's
        # dedicated core budget; plain local[N] does not bound python
        # workers, so its "N" under-states the small run's real cores).
        # 600k input keeps the parallel fraction dominant (Amdahl: 200k
        # measured 0.776, 300k 0.83, 600k 0.90 in r3; 0.914 after the r5
        # explicit-window-partitioning fix). Default 3 pairs — a TRUE
        # median; the r5 wave speedup (2-core 169→126 s, 8-core 47→34.5 s
        # after pinning the window exchanges) makes 3 pairs + the soak fit
        # the driver budget together (~700 s for pairs, worst case +230 s
        # for one symmetric re-measure).
        n_pin = int(os.environ.get("SPARK_GRAFT_PIN_URLS", "600000"))
        pin_pairs = int(os.environ.get("SPARK_GRAFT_PIN_PAIRS", "3"))
        pinned = _pinned_scaling(n_pin, pin_pairs)
        scaling["pinned"] = pinned

    # ---- 4. multi-wave soak (secondary headline; budget-gated below pairs;
    # ~110-130 s at 40k seeds incl. session start — sized so it still fits
    # after a worst-case pair protocol (both pairs re-measured) on a slow
    # box: the r5 first full run left 172 s and a 240 s gate skipped it)
    soak = {}
    if RUN_SOAK and _left() > 160:
        spark = _fresh_session(CPUS)
        soak = crawl_soak(
            spark, n_seeds=int(os.environ.get("SPARK_GRAFT_SOAK_SEEDS", "40000"))
        )
        _emit("soak", soak)
        spark.stop()
    elif RUN_SOAK:
        _emit("soak_budget_skip", {"left_s": round(_left(), 1)})

    # ---- 5. unpinned secondary (lowest priority, only if budget left;
    # documented oversubscription artifact, not the primary evidence)
    if RUN_SCALING:
        est_small = t_b * (CPUS / N_SMALL) * 0.4 + 60
        if est_small < _left():
            n_s, t_s = _wave_subprocess(N_SMALL, N_URLS)
            thr_s = n_s / t_s
            scaling["unpinned"] = {
                "n_small": N_SMALL,
                "n_big": CPUS,
                "n_urls": N_URLS,
                "urls_per_sec_small": round(thr_s, 1),
                "urls_per_sec_big": round(thr_b, 1),
                "scaling_efficiency": round((thr_b / thr_s) / (CPUS / N_SMALL), 3),
            }
            _emit("unpinned", scaling["unpinned"])
        else:
            _emit("unpinned_budget_skip", {"left_s": round(_left(), 1)})

    results = {
        "metric": "urls_fetched_deduped_per_sec",
        "value": round(thr_b, 1),
        "unit": "urls/sec",
        "queries": qtimes,
        "queries_steady": qsteady,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "crawl": crawl,
        "soak": soak,
        "scaling": scaling,
        "wall_s": round(time.time() - _T_START, 1),
    }
    # smoke/verify runs (tiny N, scaling off) set this to 0 so they don't
    # clobber the last full run's published numbers
    if os.environ.get("SPARK_GRAFT_WRITE_BASELINE", "1") == "1":
        _write_baseline_md(results)
    print(json.dumps(results))


def _write_baseline_md(r: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    s = r.get("scaling") or {}
    lines = [
        "# BENCH/BASELINE.md — measured engine numbers",
        "",
        "## Headline: URLs fetched+deduped per second (scale-mode crawl wave)",
        "",
        f"- frontier size: {r['crawl']['n_frontier_urls']} URLs (distributed synthetic, 20% hot-host skew, 25% pre-seen)",
        f"- fetched+deduped: {r['crawl']['fetched']} rows in {r['crawl']['elapsed_sec']} s "
        f"(median of {REPEATS} steady-state waves after warmup; unpinned wall "
        "time on this shared box swings up to 3x run-to-run)",
        f"- throughput at local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]: **{r['value']} urls/sec**",
        "- pipeline: canonicalize → Bloom(2^22 bits × 64 shards)+exact seen filter → priority frontier → politeness budgets → hot-host salting → deterministic image fetch (JVM-side metadata + narrow Arrow codec UDF), materialized via noop write (a count() would column-prune the codec)",
        "- reference floor being replaced: 0.014–0.056 urls/sec (50–200 articles/hour, single asyncio process — BASELINE.md)",
        "",
        "## Two-cluster-size scaling evidence (north rule, sandbox form)",
        "",
    ]
    if s:
        p, u = s["pinned"], s.get("unpinned")
        lines += [
            "**Primary (CPU-pinned, models dedicated executor cores):** the identical",
            "wave at 2 and 8 taskset-pinned cores (whole process tree — JVM task",
            "threads AND python workers share the budget, exactly like a cluster",
            f"executor), same input ({p['n_urls']} URLs):",
            "",
            "| cores (pinned) | throughput (urls/sec, median) |",
            "|---|---|",
            f"| 2 | {p['urls_per_sec_small']} |",
            f"| 8 | {p['urls_per_sec_big']} |",
            "",
            f"Scaling efficiency N→4N = **{p['scaling_efficiency']}** (median of",
            f"{p['pairs']} interleaved A/B pairs; target ≥ 0.8). Per-pair",
            f"efficiencies: {p['efficiency_per_pair']} — spread",
            f"[{p['efficiency_min']}, {p['efficiency_max']}].",
            "",
            "Methodology note (r3): measurements run as INTERLEAVED A/B pairs",
            "(2-core wave immediately followed by 8-core wave, each one fresh",
            "process, one untimed warmup wave inside each), and efficiency is",
            "computed per pair so shared-box load drift cancels instead of",
            "landing on one side — all-A-then-all-B made the same code read",
            "1.078 one run and 0.633 the next in r2. The spread is published",
            "with the median; a bare median is not evidence.",
            "Python workers are FRESH per task (spark.python.worker.reuse=",
            "false) because a reused daemon bloats in proportion to the",
            "payload volume it streams, which is 4x higher per daemon on the",
            "2-core side — that asymmetry made reuse=true read a superlinear",
            "1.0-1.11. The flat spawn tax of fresh workers biases the OTHER",
            "way (it is a larger fraction of the shorter 8-core wave), so",
            "the published efficiency is a conservative floor.",
            f"Per-pair wave times (s): 2-core {p['small_times_s']}, "
            f"8-core {p['big_times_s']}.",
            "A pair whose efficiency falls outside [0.80, 1.10] re-measures",
            "BOTH sides once and scores each side by its MIN (pinned waves",
            "are stable ±3% idle, so an outlier is contamination, which only",
            "ever ADDS time; re-measuring both sides keeps the estimator",
            "symmetric instead of conditioning on the metric under test).",
            "Raw values are in the partial JSON lines. The reported median",
            "is the LOWER middle for even pair counts (conservative).",
        ]
        if u:
            lines += [
                "",
                f"**Secondary (unpinned local[{u['n_small']}] vs local[{u['n_big']}], {u['n_urls']} URLs):**",
                f"{u['urls_per_sec_small']} → {u['urls_per_sec_big']} urls/sec, efficiency {u['scaling_efficiency']}.",
                "Unpinned local[N] under-states the small run's real core usage (python",
                "workers are processes OUTSIDE the N task slots), and at local[32] the",
                "32 JVM threads + 32 python workers oversubscribe the 32 physical cores —",
                "an artifact of sharing one box that dedicated-core executors don't have.",
                "Raw kernel scaling on this machine (multiprocessing, no Spark): 4234/s",
                "@8 procs → 15044/s @32 procs = 0.89 efficiency, the hardware ceiling.",
            ]
        else:
            lines += ["", "(unpinned secondary skipped: wall budget exhausted)"]
    else:
        lines += ["(scaling run skipped: SPARK_GRAFT_SCALING=0)"]
    soak = r.get("soak") or {}
    if soak:
        lines += [
            "",
            "## Multi-wave soak (link expansion, checkpoint-resume per wave)",
            "",
            f"- seeds: {soak['n_seeds']} URLs, waves run: {soak['waves']} (links_per_page=2; frontier grows then drains through the seen filter)",
            f"- per-wave wall (s): {soak['wave_seconds']}",
            f"- per-wave fetched rows: {soak['wave_fetched']}",
            f"- per-wave urls/sec: {soak['wave_urls_per_sec']}",
            f"- persistent RDD blocks after each wave: {soak['persistent_blocks_per_wave']}"
            " (flat ⇒ the per-wave cache release holds at bench scale — the r2 leak's regression gate)",
        ]
    lines += [
        "",
        "## Per-query wall times (noop sink, sf=" + str(r["sf"]) + ")",
        "",
        "`first` includes the one-time Catalyst/codegen compile of the",
        "query's expression trees (6-13 s on the widest ones); `steady` is",
        "the second execution in the same session — the number that matters",
        "at 100 TB, where plan compile amortizes to nothing.",
        "",
        "| query | first (s) | steady (s) |",
        "|---|---|---|",
    ]
    qs = r.get("queries_steady", {})
    for k, v in r["queries"].items():
        lines.append(f"| {k} | {v} | {qs.get(k, '—')} |")
    lines += [
        "",
        "Reference floor (BASELINE.md): 0.014-0.056 urls/sec sustained (50-200",
        "articles/hour, single asyncio process).",
    ]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
