"""Skew stress (r16 verdict task 3): the bench tables are uniform, so the
headline joins/aggs/dedup/graph families have never been TIMED against a
zipf-skewed key distribution. This runs a headline subset twice — the
driver's uniform sf0.1 tables, then a zipf-skewed same-scale regeneration
(`gen_adversarial_fixture.py --scale 0.1`: zipf(1.3) o_custkey, ~100x
hot-order lineitem fan-out, zipf l_partkey/user_id/source) — asserting

- EXACTNESS on the skewed dir (each query vs its DuckDB oracle on the
  same parquet), and
- wall time within SLACK× of the uniform run (AQE skew splitting + the
  salted paths are the mechanisms under test; a blowup is a plan bug,
  not a budget problem).

Usage: python scripts/skew_stress.py [skew_dir] (default
.adversarial/skew0.1). Prints a uniform-vs-skew table for NOTES.md.
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

UNIFORM = "/root/testdata/sf0.1"
SLACK = 2.0

#: join/agg/dedup/graph headline subset — the shapes skew actually stresses
QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume_by_nation",
    "q9_product_type_profit",
    "q18_large_volume_customers",
    "agg_rollup_region_nation",
    "window_topk_orders_per_customer",
    "join_broadcast_part_lineitem",
    "skew_salted_agg_revenue_per_priority",
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_line_level_shared_sentences",
    "graph_copurchase_degree_topk",
    "graph_cc_neardup_clusters",
    "events_tumbling_5min",
    "events_asof_purchase_click",
    "pack_chunks_per_source",
]


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.10g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def main() -> None:
    skew_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".adversarial", "skew0.1"
    )
    import duckdb

    from cinegraph_spark.queries import load_all
    from cinegraph_spark.session import get_spark

    spark = get_spark(app_name="cinegraph-skew-stress")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    spark.read.parquet(f"{UNIFORM}/region.parquet").count()

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{skew_dir}/{t}.parquet'"
        )

    rows, blowups, bad = [], [], []
    for name in QUERIES:
        spec = specs[name]
        t0 = time.perf_counter()
        spec.spark(spark, UNIFORM).count()
        t_u = time.perf_counter() - t0

        t0 = time.perf_counter()
        sdf = spec.spark(spark, skew_dir)
        srows, scols = sdf.collect(), sdf.columns
        t_s = time.perf_counter() - t0

        exact = "rows_only"
        if spec.oracle:
            d = con.execute(spec.oracle)
            dcols = [x[0] for x in d.description]
            drows = d.fetchall()
            so = sorted(range(len(scols)), key=lambda i: scols[i])
            do = sorted(range(len(dcols)), key=lambda i: dcols[i])
            ss = sorted("|".join(canon(r[i]) for i in so) for r in srows)
            ds = sorted("|".join(canon(r[i]) for i in do) for r in drows)
            exact = "exact" if (ss == ds and sorted(scols) == sorted(dcols)) \
                else "MISMATCH"
            if exact == "MISMATCH":
                bad.append(name)
        # floor the uniform time: sub-second walls are JVM noise
        ratio = t_s / max(t_u, 1.0)
        if ratio > SLACK:
            # re-measure once — shared-host noise swings 2-6x (NOTES.md)
            t0 = time.perf_counter()
            spec.spark(spark, skew_dir).count()
            t_s = min(t_s, time.perf_counter() - t0)
            ratio = t_s / max(t_u, 1.0)
        flag = "BLOWUP" if ratio > SLACK else ""
        if flag:
            blowups.append(name)
        rows.append((name, t_u, t_s, ratio, exact, flag))
        print(
            f"{name:45s} uniform {t_u:7.2f}s  skew {t_s:7.2f}s  "
            f"x{ratio:4.2f}  {exact} {flag}",
            flush=True,
        )

    print("\n| query | uniform s | skew s | ratio | oracle |")
    print("|---|---|---|---|---|")
    for name, t_u, t_s, ratio, exact, flag in rows:
        print(f"| {name} | {t_u:.2f} | {t_s:.2f} | {ratio:.2f}x "
              f"{flag} | {exact} |")
    print(f"\nSUMMARY blowups={blowups} mismatches={bad}")
    if blowups or bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
