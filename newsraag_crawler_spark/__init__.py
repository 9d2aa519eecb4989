"""newsraag_crawler_spark — a PySpark-native URL-frontier & fetch scheduler.

A from-scratch re-expression of the capabilities of the reference crawler
(VibeTrader/newsraag-crawler, see SURVEY.md) as an idiomatic Spark engine:

- ``functions/``  — URL canonicalization (RFC 3986 + SURT), hashing, text
  analysis, and deterministic image codecs, all as Spark column expressions
  or Arrow-vectorized pandas UDFs (never per-row Python).
- ``operators/``  — frontier scheduling, dedup (exact / Bloom / cuckoo / MinHash-LSH /
  SimHash), politeness budgeting, similarity search, metrics rollups.
- ``sources/``    — deterministic synthetic fixture generators (seeded) and
  loaders for the driver-provided parquet tables.
- ``storage/``    — snapshot-committed table store with per-partition lineage
  (Iceberg-semantics emulation on plain parquet; swaps 1:1 for Iceberg on a
  real cluster).
- ``plans/``      — the pure-Python reference-semantics oracle used by tests.

Design stance (SURVEY.md §7.0): batch *wave* architecture — each wave reads
the frontier, schedules fetches under per-host politeness, fetches
(deterministically synthetic in tests), dedups, expands links, and commits
one snapshot. DataFrame ops and Arrow UDFs only; no collect() of bulk data,
no RDDs.
"""

__version__ = "0.1.0"
