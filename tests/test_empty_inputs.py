"""Empty-input robustness: at 100 TB an operator routinely sees zero-row
inputs — a filter that matches nothing, a pruned partition, an empty shard.
Every registered query must either return cleanly (almost always 0 rows) or
fail fast with a *clear* ValueError (the training-based queries: you cannot
fit KMeans/PQ codebooks on nothing, and a cryptic executor stack trace at
hour 6 of a 100 TB run is the failure mode this suite exists to prevent).
"""

from __future__ import annotations

import pytest

from cinegraph_spark.queries import load_all

SPECS = load_all()

#: queries that eagerly TRAIN on the corpus — empty input is a config bug,
#: required to surface as an immediate, descriptive error.
TRAINING_QUERIES = {
    "vec_ann_pq_topk",
    "vec_ann_pq_served_topk",
    "vec_ann_pq_filtered_topk",
    "vec_ann_pq_incremental_topk",
    "vec_ann_pq_stream_update_topk",
    # the cluster family is NOT here anymore: clustering zero movies is
    # zero clusters (a root-only graph + empty membership), not a crash
    # (r17 minimal-fixture sweep; build_graph_tables early-returns) —
    # PQ stays fail-fast because codebook TRAINING has no meaningful
    # empty analog (k centroids of nothing)
}


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("empty_sf")
    for t in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        schema = pq.read_schema(f"{src}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(dst / f"{t}.parquet"))
    return str(dst)


@pytest.mark.parametrize("name", sorted(n for n in SPECS if n not in TRAINING_QUERIES))
def test_query_handles_empty_tables(name, spark, empty_dir):
    rows = SPECS[name].spark(spark, empty_dir).collect()
    assert isinstance(rows, list)


@pytest.mark.parametrize("name", sorted(TRAINING_QUERIES))
def test_training_query_fails_fast_and_clear(name, spark, empty_dir):
    with pytest.raises(ValueError, match="non-empty"):
        SPECS[name].spark(spark, empty_dir).collect()
