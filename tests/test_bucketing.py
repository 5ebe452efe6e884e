"""Bucketed-storage co-located joins: the write-once-shuffle-never contract.

The plan assertion is the point: two tables bucketed identically on the
join key must join with ZERO Exchange nodes — at 100 TB that's the
difference between a per-query fact-table shuffle and none.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cinegraph_spark.plans import plan_counts
from cinegraph_spark.queries.util import T
from cinegraph_spark.sources.bucketed import colocated_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = T(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    write_bucketed(li, "b_lineitem", "l_orderkey", 8, str(base / "li"))
    write_bucketed(o, "b_orders", "l_orderkey", 8, str(base / "o"))
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, lt, rt, "l_orderkey")
        c = plan_counts(j)
        assert c["shuffle_exchange"] == 0, "bucketed join must not shuffle"
        assert c["sort_merge_join"] + c["broadcast_hash_join"] >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_exchange(spark, sf_dir):
    """Control: the same join over plain parquet shuffles both sides."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
        o = T(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
        c = plan_counts(li.join(o, "l_orderkey"))
        assert c["shuffle_exchange"] >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_colocated_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    got = (
        colocated_join(spark, lt, rt, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum("l_extendedprice"), 4).alias("t"))
    )
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    want = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum("l_extendedprice"), 4).alias("t"))
    )
    assert {(r.o_orderpriority, r.t) for r in got.collect()} == {
        (r.o_orderpriority, r.t) for r in want.collect()
    }
