"""Portable-hash agreement (Spark == DuckDB == Python) and reference-ID
bit-compatibility."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from newsraag_crawler_spark.functions import hashing

STRINGS = ["", "a", "hello world", "https://example.com/x?a=1", "üñïçødé", "x" * 500]

_CON = duckdb.connect()


def test_spark_portable_hash(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS if s], ["s"])
    for r in df.select("s", hashing.portable_hash64("s").alias("h")).collect():
        assert r.h == hashing.portable_hash64_py(r.s), r.s


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii", exclude_characters="'\x00"), min_size=1))
def test_duckdb_portable_hash(s):
    lit = "'" + s.replace("'", "''") + "'"
    (h,) = _CON.sql(f"SELECT {hashing.portable_hash64_sql(lit)}").fetchone()
    assert h == hashing.portable_hash64_py(s)


def test_article_id_matches_reference_rule(spark):
    # md5(f"{source}:{title}:{url}") — rss_template.py:266-269
    df = spark.createDataFrame([("src", "A Title", "http://e.com/a")], ["s", "t", "u"])
    got = df.select(hashing.article_id("s", "t", "u").alias("id")).first().id
    assert got == hashing.article_id_py("src", "A Title", "http://e.com/a")
    import hashlib

    assert got == hashlib.md5(b"src:A Title:http://e.com/a").hexdigest()


def test_content_hash(spark):
    df = spark.createDataFrame([("T  One", "Body\n\ntext  here")], ["t", "c"])
    got = df.select(hashing.content_hash("t", "c").alias("h")).first().h
    assert got == hashing.content_hash_py("T  One", "Body\n\ntext  here")


def test_hamming64(spark):
    df = spark.createDataFrame([(0b1011, 0b0010)], ["a", "b"])
    assert df.select(hashing.hamming64("a", "b").alias("d")).first().d == 2
