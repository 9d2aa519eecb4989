"""Production entry point: the multi-wave crawl driver under spark-submit.

The north rule runs the engine "via spark-submit --py-files on a
multi-executor cluster"; this is that invocation (the cluster master and
executor topology come from spark-submit's own flags):

    cd /root/repo && python -c "import shutil; shutil.make_archive(
        '/tmp/newsraag_pkg', 'zip', root_dir='.',
        base_dir='newsraag_crawler_spark')"
    spark-submit --master local[8] \
        --py-files /tmp/newsraag_pkg.zip \
        scripts/crawl_wave_job.py --out /tmp/crawl_run --n-seeds 100000 \
        --waves 3 --links-per-page 2

Everything the job imports resolves from the shipped zip — the script
must run from ANY working directory (that is what the --py-files contract
means, and what tests/test_spark_submit.py verifies by submitting from a
temp dir). No addPyFile here: under spark-submit the archive is already on
every executor's PYTHONPATH.

Re-running with the same --out RESUMES from the frontier table's snapshot
lineage (`operators/wave.py run_crawl`): wave numbers continue, committed
corpus rows are never refetched, and a lineage missing its contract keys
fails loudly instead of silently restarting at wave 0.

Prints ONE JSON line: {"waves_run", "last_wave", "fetched_per_wave",
"corpus_rows"}.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="snapshot-table root dir")
    ap.add_argument("--n-seeds", type=int, default=10_000)
    ap.add_argument("--waves", type=int, default=3)
    ap.add_argument("--links-per-page", type=int, default=0)
    ap.add_argument("--n-articles", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    # spark-submit owns master/deploy config; the job only sets semantics
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("newsraag-crawl-wave")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    from newsraag_crawler_spark.operators.politeness import parse_robots
    from newsraag_crawler_spark.operators.wave import run_crawl
    from newsraag_crawler_spark.sources.synthetic import synth_frontier_df
    from newsraag_crawler_spark.storage.snapshot_store import SnapshotTable

    seeds = synth_frontier_df(spark, args.n_seeds, seed=args.seed)
    # host policy table from robots.txt BODIES (R7 end-to-end in the
    # production path): host0 (the hot host) gets a disallow + crawl-delay
    robots = spark.createDataFrame(
        [
            (
                "host0.example.com",
                "User-agent: *\nDisallow: /private\nCrawl-delay: 2\n",
                500,
            )
        ],
        "host string, robots_body string, per_wave_budget int",
    )
    policies = parse_robots(robots, body_col="robots_body").select(
        "host", "crawl_delay_s", "per_wave_budget", "robots_disallow"
    )
    tables = {
        k: SnapshotTable(spark, f"{args.out}/{k}")
        for k in ("frontier", "corpus", "seen", "metrics", "dead", "health")
    }
    out = run_crawl(
        spark,
        seeds,
        policies,
        tables,
        max_waves=args.waves,
        links_per_page=args.links_per_page,
        n_articles=args.n_articles,
        seed=args.seed,
    )
    metrics = {
        int(r["wave"]): int(r["fetched"])
        for r in tables["metrics"].read().collect()
    }
    print(
        json.dumps(
            {
                "waves_run": out["waves_run"],
                "last_wave": out["last_wave"],
                "fetched_per_wave": [metrics[w] for w in sorted(metrics)],
                "corpus_rows": tables["corpus"].read().count(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
