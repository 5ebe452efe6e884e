"""The local mirror of the driver's correctness gate: run every registered
query in Spark AND its DuckDB oracle, compare row count, column names, and
an order-insensitive value hash. Local green here is the strongest predictor
of CORRECTNESS_r{N}.json green.
"""

from __future__ import annotations

import math

import pytest

from cinegraph_spark.queries import load_all

SPECS = load_all()


def _canon(val):
    if val is None:
        return "∅"
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        # NB: deliberately NOT collapsing -0.0 into 0.0 — the driver's value
        # hash distinguishes them (CORRECTNESS_r04/r05: text_dsir_importance
        # hash-failed on a doc whose score rounded to -0.0 in DuckDB but
        # +0.0 in Spark, whose round() goes through BigDecimal and cannot
        # produce a signed zero). Oracles must normalize with `+ 0`.
        return f"{val:.10g}"
    if isinstance(val, bool):
        return str(int(val))
    return str(val)


def _rowset(columns, rows):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon_rows = sorted(
        "|".join(_canon(row[i]) for i in order) for row in rows
    )
    return [columns[i] for i in order], canon_rows


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = SPECS[name]
    sdf = spec.spark(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns

    if spec.oracle is None:
        # rows-only check (mirrors the driver's weaker gate)
        assert isinstance(srows, list)
        return

    ddf = duck.execute(spec.oracle)
    dcols = [d[0] for d in ddf.description]
    drows = ddf.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} (spark) vs {len(drows)} (duckdb)"
    )

    s_cols, s_canon = _rowset(scols, [[r[c] for c in scols] for r in srows])
    d_cols, d_canon = _rowset(dcols, drows)
    mism = [
        (a, b) for a, b in zip(s_canon, d_canon) if a != b
    ]
    assert not mism, f"{name}: {len(mism)} mismatched rows; first: {mism[:3]}"
