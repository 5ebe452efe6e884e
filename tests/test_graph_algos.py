"""Property tests for the Pregel-style graph operators.

PageRank has no DuckDB oracle (recursive aggregation isn't SQL-expressible)
— these tests carry its correctness: closed-form values on known graphs,
conservation invariants, and CC/BFS/triangle ground truths on graphs small
enough to solve by hand.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cinegraph_spark.operators.graph_algos import (
    bfs_levels,
    connected_components,
    degrees,
    pagerank,
    triangle_count,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


# --- connected components ---------------------------------------------------


def test_cc_two_components_and_chain(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple supersteps) + pair 10-11
    e = edges_df(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    got = {
        r["id"]: r["component"]
        for r in connected_components(e).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cc_direction_and_duplicates_ignored(spark):
    e = edges_df(spark, [(5, 2), (2, 5), (5, 2), (7, 7)])
    got = {r["id"]: r["component"] for r in connected_components(e).collect()}
    # self-loop-only vertex 7 is dropped by symmetrize; 2 and 5 merge
    assert got == {2: 2, 5: 2}


# --- degrees / triangles ----------------------------------------------------


def test_degrees_undirected(spark):
    e = edges_df(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    got = {r["id"]: r["degree"] for r in degrees(e).collect()}
    assert got == {1: 2, 2: 2, 3: 3, 4: 1}


def test_triangle_count_k4(spark):
    # K4 has 4 triangles; every vertex participates in 3
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    got = {r["id"]: r["triangles"] for r in triangle_count(edges_df(spark, k4)).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_count_triangle_plus_tail(spark):
    e = edges_df(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    got = {r["id"]: r["triangles"] for r in triangle_count(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1}  # tail vertex 4 in no triangle


# --- BFS ---------------------------------------------------------------------


def test_bfs_levels_chain_with_branch(spark):
    e = edges_df(spark, [(0, 1), (1, 2), (2, 3), (1, 4), (8, 9)])
    got = {r["id"]: r["level"] for r in bfs_levels(e, 0).collect()}
    # 8-9 unreachable from 0
    assert got == {0: 0, 1: 1, 2: 2, 4: 2, 3: 3}


# --- PageRank ----------------------------------------------------------------


def test_pagerank_symmetric_pair_equal_ranks(spark):
    e = edges_df(spark, [(1, 2), (2, 1)])
    ranks = {r["id"]: r["rank"] for r in pagerank(e, iterations=10).collect()}
    assert ranks[1] == pytest.approx(ranks[2])
    assert ranks[1] == pytest.approx(1.0)  # regular graph fixpoint


def test_pagerank_cycle_uniform(spark):
    # directed 4-cycle: uniform stationary distribution, rank = 1.0 each
    e = edges_df(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    ranks = [r["rank"] for r in pagerank(e, iterations=15).collect()]
    assert all(x == pytest.approx(1.0, abs=1e-6) for x in ranks)


def test_pagerank_star_closed_form(spark):
    # star: leaves 2..5 -> hub 1, hub -> leaves. After convergence:
    # leaf = (1-d) + d*hub/4, hub = (1-d) + d*4*leaf ; d=0.85
    e = edges_df(spark, [(i, 1) for i in range(2, 6)] + [(1, i) for i in range(2, 6)])
    ranks = {r["id"]: r["rank"] for r in pagerank(e, iterations=40).collect()}
    d = 0.85
    hub = (1 - d) * (1 + 4 * d) / (1 - d * d)
    leaf = (1 - d) + d * hub / 4
    # power iteration converges as d^k: 0.85^40 ~ 1.5e-3 relative error
    assert ranks[1] == pytest.approx(hub, rel=3e-3)
    for i in range(2, 6):
        assert ranks[i] == pytest.approx(leaf, rel=3e-3)


def test_pagerank_conservation_no_dangling(spark):
    # with no dangling vertices, total rank == vertex count every iteration
    e = edges_df(spark, [(1, 2), (2, 3), (3, 1), (3, 2), (2, 1)])
    total = pagerank(e, iterations=7).agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(3.0, rel=1e-9)
