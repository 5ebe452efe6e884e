"""Fresh-process driver simulation (verify-skill recipe): plain session,
hostile timezone, run registry queries vs DuckDB oracles at a given sf.
Usage: python scripts/driver_sim.py [names...|ALL] — run from any cwd."""
import sys, math, os, time

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod
from pyspark.sql import SparkSession
import duckdb

sf_dir = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
spark = (
    SparkSession.builder.master(
        "local[%s]" % os.environ.get("SIM_CPUS", "8")
    )
    # SIM_TZ / SIM_SHUFFLE let a sweep vary the hostile environment —
    # e.g. Asia/Kolkata (half-hour offset, catches what a whole-hour
    # zone cannot) and an odd partition count
    .config(
        "spark.sql.session.timeZone",
        os.environ.get("SIM_TZ", "America/New_York"),
    )
    .config(
        "spark.sql.shuffle.partitions", os.environ.get("SIM_SHUFFLE", "200")
    )
    .config("spark.ui.enabled", "false")
    # the default 1g driver heap OOMs on the sf0.1 join-heavy queries
    # (triangles); this knob sizes the sim's JVM, it is NOT an engine
    # conf the queries may rely on
    .config(
        "spark.driver.memory", os.environ.get("SIM_DRIVER_MEM", "6g")
    )
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
qs, os_ = entrymod.queries(), entrymod.oracle_sql()
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


names = sys.argv[1:]
if names == ["ALL"]:
    names = list(qs)
# SIM_SKIP: comma-separated names to exclude (e.g. the byte-wise
# media_payload_checksums oracle on a non-ASCII corpus — documented
# ASCII-corpus contract, queries/multimodal.py:51)
skip = {s for s in os.environ.get("SIM_SKIP", "").split(",") if s}
names = [n for n in names if n not in skip]
bad, ok_n, ro_n = [], 0, 0
for name in names:
    t0 = time.perf_counter()

    def _el():  # per-query wall seconds (sf1 sweep evidence, r18)
        return f"{time.perf_counter() - t0:.1f}s"

    try:
        sdf = qs[name](spark, sf_dir)
        srows, scols = sdf.collect(), sdf.columns
        sql = os_.get(name)
        if sql is None:
            ro_n += 1
            print(name, "rows_only", len(srows), _el(), flush=True)
            continue
        d = con.execute(sql)
        dcols = [x[0] for x in d.description]
        drows = d.fetchall()
        so = sorted(range(len(scols)), key=lambda i: scols[i])
        do = sorted(range(len(dcols)), key=lambda i: dcols[i])
        sset = sorted("|".join(canon(r[i]) for i in so) for r in srows)
        dset = sorted("|".join(canon(r[i]) for i in do) for r in drows)
        good = sorted(scols) == sorted(dcols) and sset == dset
        print(
            name, "OK" if good else "MISMATCH", len(srows), _el(),
            flush=True,
        )
        if good:
            ok_n += 1
        else:
            bad.append(name)
    except Exception as e:
        print(name, "ERROR", repr(e)[:200], _el(), flush=True)
        bad.append(name)
print(f"SUMMARY ok={ok_n} rows_only={ro_n} bad={len(bad)} {bad}")
spark.stop()
