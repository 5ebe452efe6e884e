"""Adversarial fixture generator — fixture-independence sweep (r17).

Every exact oracle in the registry has only ever been proven on the
driver's fixed-seed tables (seed 42, uniform keys, plain ASCII word-soup
text). This script regenerates all ten tables with the SAME schemas
(FIXTURES.md §A) but a different seed and deliberately hostile shapes:

- NULLs in every nullable non-key column (text, lang, source, n_chars,
  acctbal, tax, totalprice, value, props, mktsegment)
- empty strings, whitespace-only text, single-token and digit/punct-only
  documents, one ~20k-char document
- subtitle artifacts that make F1-F11 nontrivial (SRT timestamp blocks,
  HTML tags, speaker labels, bracketed directions, fillers, dash lines)
- shared boilerplate sentences across documents (C4 line-level signal)
- planted near-duplicate pairs (verified >= 0.6 shingle-Jaccard via the
  registry's own SHINGLE_CTES) and NO exact duplicates in the base corpus
- zipf-skewed join/dedup keys (o_custkey, l_orderkey fan-out, l_partkey,
  events.user_id, documents.source) and an events time-burst
- boundary timestamps (leap days, midnight vs. intra-day, exact month
  edges), zero quantities, 0/0.1 discount edges, p_size 0
- embeddings: a zero vector (own label — cosine NULL path), an exact
  duplicate pair, magnitude outliers (1e-3 / 1e3), float32 storage

Variants (--variant):
- ascii   (default) — text alphabet restricted to single-byte chars, so
  the byte-wise media_payload_checksums oracle stays exact. Excluded
  code points, each a DOCUMENTED Spark(Java-regex)-vs-DuckDB(RE2) or
  Python dialect gap, NOT an engine bug: \x0B (Java \s includes it, RE2
  does not), bare \r (Java (?m)^/$ treat it as a line terminator, RE2
  only \n), \x85/ /  (Java-only line terminators).
- unicode — documents.text additionally carries emoji, CJK, accented
  latin and curly quotes (multi-byte — run the sweep with
  SIM_SKIP=media_payload_checksums: its oracle is char-wise by a
  documented ASCII-corpus contract, queries/multimodal.py:51).
- minimal — every table exactly ONE row (degenerate-shape sweep).

Invariants preserved (tests/test_fixture_assumptions.py):
- events.ts is timestamp[us]; every user_id exists in customer keys
- documents/embeddings row counts stay 500 at the default scale
- every same-label embedding-pair cosine is > 1e-6 away from the 0.35
  CC threshold (verified; jitter reseeded until it holds)

Usage: python scripts/gen_adversarial_fixture.py OUTDIR
           [--seed 1337] [--variant ascii|unicode|minimal] [--scale 0.01]
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "the and of is a to in it or an "            # en markers + glue
    "el la de que los una "                       # es markers
    "der und die das ein nicht "                  # de markers
    "le et les des un pour "                      # fr markers
    "shi bu hao ma "                              # zh-pinyin markers
    "join filter window stream batch merge sort hash scan table row "
    "column key value query plan spark data part order line customer "
    "supplier fast slow big small dup agg group"
).split()

BOILERPLATE = [
    "subscribe to our channel for more content",
    "copyright 2024 all rights reserved worldwide",
    "this transcript was generated automatically",
    "visit example dot com for the full archive",
]

SPEAKERS = ["JOHN", "MARY", "NARRATOR", "Bob", "Anna"]
FILLERS = ["um", "uh", "hmm", "gonna", "like", "okay", "yeah"]
UNICODE_SPICE = [
    "café", "naïve", "東京", "\U0001f3ac",
    "Ωmega", "“quoted”", "‘single’",
    "семь", "Über",
]

EMOTIONS = None  # documents are free text; no scored-frame columns here


def _soup(rng, n_tokens, extra=()):
    words = list(rng.choice(VOCAB, size=max(n_tokens, 1)))
    for w in extra:
        words.insert(int(rng.integers(0, len(words) + 1)), w)
    return " ".join(words)


def _subtitle_doc(rng, unicode_ok):
    blocks = []
    for i in range(int(rng.integers(2, 6))):
        t0 = int(rng.integers(0, 5400))
        blocks.append(str(i + 1))
        blocks.append(
            f"00:{t0 // 60:02d}:{t0 % 60:02d},{int(rng.integers(0, 999)):03d} "
            f"--> 00:{t0 // 60:02d}:{t0 % 60 + 1:02d},000"
        )
        line = _soup(rng, int(rng.integers(4, 10)))
        deco = rng.integers(0, 6)
        if deco == 0:
            line = f"<i>{line}</i>"
        elif deco == 1:
            line = f"[{rng.choice(['MUSIC', 'APPLAUSE', 'static'])}] " + line
        elif deco == 2:
            line = f"{rng.choice(SPEAKERS)}: " + line
        elif deco == 3:
            line = "- " + line + "..."
        elif deco == 4:
            line = f"{rng.choice(FILLERS)}, " + line + "!?"
        if unicode_ok and rng.integers(0, 3) == 0:
            line += " " + str(rng.choice(UNICODE_SPICE))
        blocks.append(line)
        blocks.append("")
    return "\n".join(blocks)


def gen_documents(rng, n, unicode_ok):
    rows = []
    texts_seen = set()
    neardup_partner = {}
    for i in range(n):
        m = i % 50
        text: str | None
        if m == 7:
            text = ""
        elif m == 17:
            text = "  \t\n   \f "
        elif m == 27:
            text = "solitary"
        elif m == 37:
            text = "12345 !!! ??? ... 67890 ;;;"
        elif m == 47:
            text = None
        elif m == 33:
            text = _soup(rng, 4000)
        elif i in neardup_partner:
            base = neardup_partner.pop(i)
            toks = base.split(" ")
            for _ in range(2):
                toks[int(rng.integers(0, len(toks)))] = str(
                    rng.choice(VOCAB)
                )
            text = " ".join(toks)
        elif i % 10 == 5:
            text = _subtitle_doc(rng, unicode_ok)
        elif i % 10 == 9:
            picks = rng.choice(len(BOILERPLATE), size=2, replace=False)
            text = (
                BOILERPLATE[picks[0]]
                + ". "
                + _soup(rng, int(rng.integers(10, 40)))
                + ". "
                + BOILERPLATE[picks[1]]
                + "."
            )
        else:
            n_tok = int(min(rng.zipf(1.6) * 8, 2000))
            extra = []
            if unicode_ok and rng.integers(0, 4) == 0:
                extra = list(rng.choice(UNICODE_SPICE, size=2))
            text = _soup(rng, n_tok, extra)
            if i % 25 == 3 and i + 1 < n and (i + 1) % 50 not in (
                7, 17, 27, 33, 37, 47,
            ):
                neardup_partner[i + 1] = text
        # keep the base corpus free of exact duplicates (documented
        # assumption of the dup-injected dedup queries)
        while text is not None and text in texts_seen:
            text = text + " " + str(rng.choice(VOCAB))
        if text is not None:
            texts_seen.add(text)
        lang = None if i % 97 == 13 else str(
            rng.choice(["en", "en", "en", "es", "de", "fr", "zh"])
        )
        # skew: src13 takes ~30% of the corpus
        source = (
            None
            if i % 131 == 70
            else ("src13" if rng.integers(0, 10) < 3 else f"src{int(rng.integers(0, 20))}")
        )
        n_chars = None if text is None else len(text)
        if i % 89 == 31 and n_chars is not None:
            n_chars = n_chars + 7  # declared drift (metadata lies sometimes)
        rows.append((i, text, lang, source, n_chars))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def gen_embeddings(rng, n, dim=64):
    """Clustered vectors with hostile rows; retried by the caller until
    every same-label pair's cosine clears the 0.35 CC threshold."""
    centers = rng.normal(size=(10, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs, labels = [], []
    for i in range(n):
        lab = int(rng.integers(0, 10))
        v = centers[lab] * 0.95 + rng.normal(size=dim) * 0.03
        v = v / np.linalg.norm(v)
        if i % 173 == 100:
            v = v * 1e3  # magnitude outlier (cosine invariant to scale)
        elif i % 173 == 150:
            v = v * 1e-3
        vecs.append(v)
        labels.append(lab)
    # exact duplicate pair, same label
    vecs[11] = vecs[10].copy()
    labels[11] = labels[10]
    # zero vector under its OWN label (cosine hits the NULL path; no
    # same-label pair, so the 0.35-threshold invariant is untouched)
    vecs[n - 1] = np.zeros(dim)
    labels[n - 1] = 99
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [np.asarray(v, dtype=np.float32) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )


def _check_embedding_threshold(path):
    import duckdb

    con = duckdb.connect()
    closest = con.execute(
        f"""
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v
                   FROM '{path}')
        SELECT min(abs(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))) - 0.35))
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, a.v) > 0 AND list_dot_product(b.v, b.v) > 0
        """
    ).fetchone()[0]
    return closest is not None and closest > 1e-6


def gen_tpch(rng, scale):
    t = {}
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    t["region"] = pa.table(
        {
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": pa.array(regions, pa.string()),
        }
    )
    t["nation"] = pa.table(
        {
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": pa.array([f"NATION_{i}" for i in range(25)], pa.string()),
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        }
    )
    n_supp = max(1, int(10000 * scale))
    t["supplier"] = pa.table(
        {
            "s_suppkey": pa.array(range(n_supp), pa.int64()),
            "s_name": pa.array(
                [f"Supplier#{i:09d}" for i in range(n_supp)], pa.string()
            ),
            "s_nationkey": pa.array(
                rng.integers(0, 25, n_supp).astype(np.int32), pa.int32()
            ),
            "s_acctbal": pa.array(
                [
                    None if i % 67 == 30 else round(float(x), 2)
                    for i, x in enumerate(rng.uniform(-999, 9999, n_supp))
                ],
                pa.float64(),
            ),
        }
    )
    n_cust = max(1, int(150000 * scale))
    segs = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
    nat_skew = np.minimum(rng.zipf(1.5, n_cust) - 1, 24).astype(np.int32)
    t["customer"] = pa.table(
        {
            "c_custkey": pa.array(range(n_cust), pa.int64()),
            "c_name": pa.array(
                [f"Customer#{i:09d}" for i in range(n_cust)], pa.string()
            ),
            "c_nationkey": pa.array(nat_skew, pa.int32()),
            "c_acctbal": pa.array(
                [
                    None if i % 83 == 40 else round(float(x), 2)
                    for i, x in enumerate(rng.uniform(-999, 9999, n_cust))
                ],
                pa.float64(),
            ),
            "c_mktsegment": pa.array(
                [
                    None
                    if i % 101 == 50
                    else ("" if i % 103 == 60 else segs[int(rng.integers(0, 5))])
                    for i in range(n_cust)
                ],
                pa.string(),
            ),
        }
    )
    n_part = max(1, int(200000 * scale))
    adjs = ["cold", "small", "large", "dim", "hot", "plain"]
    nouns = ["widget", "bolt", "gear", "cog", "spring"]
    types = ["ECONOMY", "PROMO", "STANDARD", "SMALL", "LARGE"]
    t["part"] = pa.table(
        {
            "p_partkey": pa.array(range(n_part), pa.int64()),
            "p_name": pa.array(
                [
                    f"{adjs[int(rng.integers(0, 6))]} {nouns[int(rng.integers(0, 5))]}"
                    for _ in range(n_part)
                ],
                pa.string(),
            ),
            "p_brand": pa.array(
                [f"Brand#{int(rng.integers(1, 26))}" for _ in range(n_part)],
                pa.string(),
            ),
            "p_type": pa.array(
                [types[int(rng.integers(0, 5))] for _ in range(n_part)],
                pa.string(),
            ),
            "p_size": pa.array(
                np.minimum(rng.zipf(1.4, n_part) - 1, 50).astype(np.int32),
                pa.int32(),
            ),
            "p_retailprice": pa.array(
                [round(900 + (i % 37) / 10, 2) for i in range(n_part)],
                pa.float64(),
            ),
        }
    )

    n_ord = max(1, int(1500000 * scale))
    # zipf customer keys: a handful of whales own a large share of orders
    cust_of_order = np.minimum(rng.zipf(1.3, n_ord) - 1, n_cust - 1)
    statuses = np.array(["P", "O", "F"])
    prios = np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    )
    prio_idx = np.minimum(rng.zipf(1.7, n_ord) - 1, 4)
    base = dt.datetime(1995, 1, 1)
    span_s = int((dt.datetime(2001, 8, 1) - base).total_seconds())
    odate_off = rng.integers(0, span_s, n_ord)
    odates = []
    for i, off in enumerate(odate_off):
        d = base + dt.timedelta(seconds=int(off))
        if i % 3 == 0:
            d = d.replace(hour=0, minute=0, second=0, microsecond=0)
        if i % 977 == 100:
            d = dt.datetime(1996, 2, 29, 23, 59, 59, 999999)  # leap edge
        odates.append(d)
    t["orders"] = pa.table(
        {
            "o_orderkey": pa.array(range(n_ord), pa.int64()),
            "o_custkey": pa.array(cust_of_order.astype(np.int64), pa.int64()),
            "o_orderstatus": pa.array(
                statuses[rng.integers(0, 3, n_ord)], pa.string()
            ),
            "o_totalprice": pa.array(
                [
                    None if i % 331 == 200 else round(float(x), 2)
                    for i, x in enumerate(rng.uniform(1, 500000, n_ord))
                ],
                pa.float64(),
            ),
            "o_orderdate": pa.array(odates, pa.timestamp("us")),
            "o_orderpriority": pa.array(prios[prio_idx], pa.string()),
        }
    )

    # lineitem: 1-7 lines per order normally; every 1500th order is a hot
    # key with ~100x fan-out (the skew-stress target)
    lk, pk, sk, ln = [], [], [], []
    qty, ep, disc, tax, rf, ls, sd = [], [], [], [], [], [], []
    flags = ["A", "N", "R"]
    stats_l = ["O", "F"]
    for ok in range(n_ord):
        n_lines = int(rng.integers(1, 8))
        if ok % 1500 == 750:
            n_lines = int(rng.integers(200, 400))
        odate = odates[ok]
        for j in range(n_lines):
            lk.append(ok)
            pk.append(int(min(rng.zipf(1.4) - 1, n_part - 1)))
            sk.append(int(rng.integers(0, n_supp)))
            ln.append(j + 1)
            q = float(rng.integers(0, 51))
            qty.append(q)
            ep.append(round(q * (900 + (j % 37) / 10), 2))
            disc.append(round(float(rng.integers(0, 11)) / 100, 2))
            tax.append(
                None
                if rng.integers(0, 500) == 7
                else round(float(rng.integers(0, 9)) / 100, 2)
            )
            rf.append(flags[int(rng.integers(0, 3))])
            ls.append(stats_l[int(rng.integers(0, 2))])
            sd.append(odate + dt.timedelta(days=int(rng.integers(0, 121))))
    t["lineitem"] = pa.table(
        {
            "l_orderkey": pa.array(lk, pa.int64()),
            "l_partkey": pa.array(pk, pa.int64()),
            "l_suppkey": pa.array(sk, pa.int64()),
            "l_linenumber": pa.array(ln, pa.int32()),
            "l_quantity": pa.array(qty, pa.float64()),
            "l_extendedprice": pa.array(ep, pa.float64()),
            "l_discount": pa.array(disc, pa.float64()),
            "l_tax": pa.array(tax, pa.float64()),
            "l_returnflag": pa.array(rf, pa.string()),
            "l_linestatus": pa.array(ls, pa.string()),
            "l_shipdate": pa.array(sd, pa.timestamp("us")),
        }
    )
    return t, n_cust


def gen_events(rng, scale, n_cust):
    n_ev = max(1, int(1000000 * scale))
    base = dt.datetime(2024, 1, 1)
    ts = []
    burst_start = dt.datetime(2024, 1, 15, 12, 0, 0)
    for i in range(n_ev):
        if i % 20 == 3:  # 5% burst inside one hour (window-skew)
            ts.append(
                burst_start
                + dt.timedelta(microseconds=int(rng.integers(0, 3600_000_000)))
            )
        elif i % 50 == 21 and ts:  # exact-duplicate timestamps
            ts.append(ts[-1])
        else:
            ts.append(
                base
                + dt.timedelta(
                    microseconds=int(rng.integers(0, 30 * 86400 * 1_000_000))
                )
            )
    etypes = np.array(["view", "click", "purchase", "signup", "error"])
    type_idx = np.minimum(rng.zipf(1.6, n_ev) - 1, 4)
    users = np.minimum(rng.zipf(1.4, n_ev) - 1, n_cust - 1)
    props = []
    for i in range(n_ev):
        if i % 53 == 11:
            props.append(None)
        elif i % 53 == 29:
            props.append("{}")
        else:
            props.append(json.dumps({"k": int(rng.integers(0, 100))}))
    return pa.table(
        {
            "event_id": pa.array(range(n_ev), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(users.astype(np.int64), pa.int64()),
            "event_type": pa.array(etypes[type_idx], pa.string()),
            "value": pa.array(
                [
                    None if i % 211 == 100 else round(float(x), 2)
                    for i, x in enumerate(rng.uniform(0, 1000, n_ev))
                ],
                pa.float64(),
            ),
            "props": pa.array(props, pa.string()),
        }
    )


def gen_minimal(outdir):
    """One row per table — the degenerate-shape sweep."""
    rng = np.random.default_rng(7)
    t, _ = gen_tpch(rng, 1 / 150000)  # n_cust=1, n_ord=10, tiny everything
    # cut orders/lineitem/part/supplier down to exactly one row
    for name in ("orders", "lineitem", "part", "supplier", "customer"):
        t[name] = t[name].slice(0, 1)
    ev = gen_events(np.random.default_rng(8), 1 / 1000000, 1)
    t["events"] = ev.slice(0, 1)
    t["documents"] = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["the only document here"], pa.string()),
            "lang": pa.array(["en"], pa.string()),
            "source": pa.array(["src0"], pa.string()),
            "n_chars": pa.array([22], pa.int64()),
        }
    )
    t["embeddings"] = pa.table(
        {
            "vec_id": pa.array([0], pa.int64()),
            "embedding": pa.array(
                [np.full(64, 0.125, dtype=np.float32)], pa.list_(pa.float32())
            ),
            "label": pa.array([0], pa.int32()),
        }
    )
    for name, tbl in t.items():
        pq.write_table(tbl, os.path.join(outdir, f"{name}.parquet"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--seed", type=int, default=1337)
    ap.add_argument(
        "--variant", choices=["ascii", "unicode", "minimal"], default="ascii"
    )
    ap.add_argument("--scale", type=float, default=0.01)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    if args.variant == "minimal":
        gen_minimal(args.outdir)
        print("minimal fixture written to", args.outdir)
        return

    rng = np.random.default_rng(args.seed)
    unicode_ok = args.variant == "unicode"
    tables, n_cust = gen_tpch(rng, args.scale)
    tables["events"] = gen_events(rng, args.scale, n_cust)
    n_docs = 500 if args.scale <= 0.011 else int(50000 * args.scale)
    tables["documents"] = gen_documents(rng, n_docs, unicode_ok)
    n_emb = 500 if args.scale <= 0.011 else int(20000 * args.scale)

    for name, tbl in tables.items():
        pq.write_table(tbl, os.path.join(args.outdir, f"{name}.parquet"))

    # embeddings: regenerate until the 0.35-threshold invariant holds
    emb_path = os.path.join(args.outdir, "embeddings.parquet")
    for attempt in range(20):
        emb = gen_embeddings(np.random.default_rng(args.seed + attempt), n_emb)
        pq.write_table(emb, emb_path)
        if _check_embedding_threshold(emb_path):
            break
    else:
        sys.exit("embeddings: could not clear the 0.35 cosine threshold")

    # --- self-checks ------------------------------------------------------
    import duckdb

    con = duckdb.connect()
    doc = os.path.join(args.outdir, "documents.parquet")
    if not unicode_ok:
        bad = con.execute(
            f"""SELECT count(*) FROM '{doc}'
                WHERE text IS NOT NULL AND (
                  octet_length(encode(text)) <> length(text)
                  OR regexp_matches(text, '[\\x0b\\r]'))"""
        ).fetchone()[0]
        assert bad == 0, f"{bad} docs violate the ascii/no-\\x0B/no-\\r contract"
    dups = con.execute(
        f"""SELECT count(*) FROM (SELECT text FROM '{doc}'
            WHERE text IS NOT NULL GROUP BY text HAVING count(*) > 1)"""
    ).fetchone()[0]
    assert dups == 0, "base corpus must have no exact duplicates"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from cinegraph_spark.queries.neardup_common import SHINGLE_CTES

    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{doc}'")
    n_pairs = con.execute(
        f"""WITH {SHINGLE_CTES}
            SELECT count(*) FROM common
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.6"""
    ).fetchone()[0]
    assert n_pairs > 0, "no planted near-dup pairs at >=0.6 Jaccard"
    orphans = con.execute(
        f"""SELECT count(*) FROM '{args.outdir}/events.parquet' e
            WHERE NOT EXISTS (SELECT 1 FROM '{args.outdir}/customer.parquet' c
                              WHERE c.c_custkey = e.user_id)"""
    ).fetchone()[0]
    assert orphans == 0, "events reference user_ids outside customer keys"
    print(
        f"adversarial fixture ({args.variant}, seed {args.seed}, "
        f"scale {args.scale}) written to {args.outdir}; "
        f"near-dup pairs={n_pairs}"
    )


if __name__ == "__main__":
    main()
