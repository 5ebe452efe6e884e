"""Guards on driver-testdata assumptions that oracles quietly rely on.

The driver regenerates /root/testdata each round, and regenerations HAVE
changed semantics mid-project (round 6: events.parquet switched from
TIMESTAMP(NANOS) to naive TIMESTAMP(MICROS), silently breaking a pinned
streaming schema). Each test here asserts one assumption some oracle or
reader depends on, so the next regeneration fails HERE with a named
assumption instead of as a cryptic driver hash mismatch.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


def test_events_ts_unit_is_us_or_ns():
    """queries/util.py::_events and the streaming sniffer handle exactly
    timestamp[us]/timestamp[ns] (or int64); anything else is a new case."""
    t = pq.read_schema(f"{TESTDATA}/events.parquet").field("ts").type
    assert str(t) in ("timestamp[us]", "timestamp[ns]", "int64"), (
        f"events.ts physical type changed to {t} — update _events and "
        "_events_ts_unit_divisor"
    )


def test_documents_text_is_single_byte_safe():
    """media_payload_checksums' SQL oracle recomputes a BYTE checksum
    character-wise — exact only while every document char is one UTF-8
    byte (printable ASCII). A non-ASCII regeneration must demote that
    oracle to rows-only."""
    tbl = pq.read_table(f"{TESTDATA}/documents.parquet", columns=["text"])
    for chunk in tbl["text"].chunks:
        for v in chunk:
            s = v.as_py()
            assert len(s.encode("utf-8")) == len(s), (
                "documents.text contains multi-byte chars — the "
                "media_payload_checksums oracle is no longer byte-exact"
            )


def test_documents_have_planted_near_dups():
    """The near-dup family's recall tests assume the corpus plants
    near-duplicate pairs; an empty pair set would make several dedup
    queries vacuous (0 rows) without failing anything."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{TESTDATA}/documents.parquet'"
    )
    from cinegraph_spark.queries.neardup_common import SHINGLE_CTES

    n = con.execute(
        f"""
        WITH {SHINGLE_CTES}
        SELECT count(*) FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.6
        """
    ).fetchone()[0]
    assert n > 0, "no planted near-dup pairs at >=0.6 Jaccard in fixtures"


def test_events_user_ids_within_customer_keys():
    """stream_enrich_purchase_customer joins user_id = c_custkey; if a
    regeneration widens the user_id range past the customer keys the
    enrichment silently drops rows (inner join)."""
    import duckdb

    con = duckdb.connect()
    # Set membership, not a max() comparison: a regenerated customer table
    # with gaps in its key space would pass a max-based guard while the
    # inner join silently dropped events for the missing keys.
    orphans, = con.execute(
        f"""
        SELECT count(*) FROM '{TESTDATA}/events.parquet' e
        WHERE NOT EXISTS (
          SELECT 1 FROM '{TESTDATA}/customer.parquet' c
          WHERE c.c_custkey = e.user_id
        )
        """
    ).fetchone()
    assert orphans == 0, (
        f"{orphans} events reference user_ids absent from customer keys — "
        "the stream enrichment inner join now drops events"
    )


@pytest.mark.parametrize("table", ["documents", "embeddings"])
def test_small_tables_have_expected_scale(table):
    """documents are 500 rows at sf<=0.01 and 5000 at sf0.1; embeddings
    500 / 2000 — row-count intuition several fixtures rely on."""
    n = pq.read_metadata(f"{TESTDATA}/{table}.parquet").num_rows
    assert n in (500, 2000, 5000), f"{table} row count changed to {n}"


def test_embedding_cosines_clear_of_cc_threshold():
    """dedup_embedding_cc_survivors gates pairs on cosine >= 0.35 evaluated
    independently in Spark (sequential F.aggregate fold) and DuckDB
    (list_dot_product) — their float summation orders are not contractually
    identical, so a pair whose cosine sits within float-noise of 0.35 could
    flip a connected-component split between engines and fail the bit-exact
    oracle. Assert the regenerated fixtures keep every same-label pair's
    cosine at least 1e-6 away from the threshold."""
    import duckdb

    con = duckdb.connect()
    closest, = con.execute(
        f"""
        WITH e AS (
          SELECT vec_id, label,
                 CAST(embedding AS DOUBLE[]) AS v
          FROM '{TESTDATA}/embeddings.parquet'
        )
        SELECT min(abs(
          list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(b.v, b.v)))
          - 0.35))
        FROM e a JOIN e b
          ON a.label = b.label AND a.vec_id < b.vec_id
        """
    ).fetchone()
    assert closest is not None and closest > 1e-6, (
        f"a same-label embedding pair's cosine is {closest} from the 0.35 "
        "CC threshold — engine float-order noise can flip the component "
        "split; re-pick the threshold or demote the oracle to rows-only"
    )


def test_shingle_over_sql_matches_shared_ctes():
    """`shingle_over_sql` (parameterized shingle CTEs for arbitrary
    (doc_id, text) relations, used by the incremental-dedup oracle) must
    stay token-for-token equivalent to the shared SHINGLE_CTES
    construction when pointed at the same `documents` relation — drift
    between the two would silently skew the incremental oracle."""
    import duckdb

    from cinegraph_spark.queries.neardup_common import (
        SHINGLE_CTES,
        shingle_over_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{TESTDATA}/documents.parquet'"
    )
    a = con.execute(
        f"WITH {SHINGLE_CTES} SELECT doc_id, shingle FROM sh_all "
        "ORDER BY doc_id, shingle"
    ).fetchall()
    b = con.execute(
        f"WITH {shingle_over_sql('documents')} "
        "SELECT doc_id, shingle FROM sh_u ORDER BY doc_id, shingle"
    ).fetchall()
    assert a == b and len(a) > 0
