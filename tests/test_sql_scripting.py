"""Spark 4 SQL scripting surface (spark.sql.scripting.enabled) — the
stored-procedure control-flow layer over the engine's SQL: compound
statements, script variables, WHILE loops, FOR cursors, IF/ELSE. Each
statement inside a script is planned by Catalyst independently, so
scripting adds control flow without ever becoming a row path; the
registered `script_trailing_quarter_report` carries the exact-oracle
proof, these pins cover the control-flow constructs themselves.
"""

from __future__ import annotations

import pytest

from cinegraph_spark.session import scoped_confs


@pytest.fixture()
def scripting(spark):
    with scoped_confs(spark, **{"spark.sql.scripting.enabled": "true"}):
        yield spark


def test_while_loop_and_variables(scripting):
    got = scripting.sql(
        """
        BEGIN
          DECLARE total INT DEFAULT 0;
          DECLARE i INT DEFAULT 1;
          WHILE i <= 5 DO
            SET total = total + i;
            SET i = i + 1;
          END WHILE;
          SELECT total AS s;
        END
        """
    ).collect()
    assert [tuple(r) for r in got] == [(15,)]


def test_for_cursor_with_conditional(scripting):
    """FOR iterates a query's rows; IF/ELSE branches per row — the
    cursor shape reporting procedures use. The loop accumulates into a
    script variable, so the result is order-independent."""
    got = scripting.sql(
        """
        BEGIN
          DECLARE evens INT DEFAULT 0;
          DECLARE odds INT DEFAULT 0;
          FOR row AS SELECT id FROM range(10) DO
            IF row.id % 2 = 0 THEN
              SET evens = evens + 1;
            ELSE
              SET odds = odds + 1;
            END IF;
          END FOR;
          SELECT evens, odds;
        END
        """
    ).collect()
    assert [tuple(r) for r in got] == [(5, 5)]


def test_script_statements_keep_catalyst_plans(scripting, sf_dir):
    """Scripting is control flow, not execution: a scripted aggregate
    returns the same rows as its plain-SQL twin (each statement plans
    through Catalyst unchanged)."""
    from cinegraph_spark.queries.util import T

    T(scripting, sf_dir, "orders").createOrReplaceTempView("_tsql_orders")
    scripted = scripting.sql(
        """
        BEGIN
          DECLARE lo STRING DEFAULT '1-URGENT';
          SELECT o_orderpriority, count(*) AS n
          FROM _tsql_orders WHERE o_orderpriority <> lo GROUP BY 1;
        END
        """
    ).collect()
    plain = scripting.sql(
        "SELECT o_orderpriority, count(*) AS n FROM _tsql_orders "
        "WHERE o_orderpriority <> '1-URGENT' GROUP BY 1"
    ).collect()
    assert sorted(map(tuple, scripted)) == sorted(map(tuple, plain))
