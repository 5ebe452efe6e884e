"""Negative-zero audit of the oracle surface.

The driver's value hash distinguishes ``-0.0`` from ``0.0``. Spark's
``round()`` goes through BigDecimal and can never emit a signed zero;
DuckDB's ``round()`` preserves it — so any rounded, negative-capable oracle
column can silently hash-mismatch on data where a value rounds to zero from
below (this cost rounds 4 and 5 their ``text_dsir_importance`` check, and
``pipeline_scaled_features`` hit it at sf0.1). The fix convention is
``round(...) + 0`` on the DuckDB side; this test enforces it by running
EVERY oracle and asserting no -0.0 appears in any float column at the
session's fixture scale.
"""

from __future__ import annotations

import math

import pytest

from cinegraph_spark.queries import load_all

SPECS = load_all()
ORACLES = sorted(n for n, s in SPECS.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLES)
def test_oracle_emits_no_negative_zero(name, duck):
    cur = duck.execute(SPECS[name].oracle)
    cols = [d[0] for d in cur.description]
    offenders = set()
    for row in cur.fetchall():
        for c, v in zip(cols, row):
            if (
                isinstance(v, float)
                and v == 0.0
                and math.copysign(1.0, v) < 0
            ):
                offenders.add(c)
    assert not offenders, (
        f"{name}: columns {sorted(offenders)} emit -0.0 — append '+ 0' to "
        "the rounded expression in the oracle SQL"
    )
