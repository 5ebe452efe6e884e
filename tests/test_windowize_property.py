"""Property pin: ``windowize`` equals the reference's sliding-window loop
(``while start < n: emit tokens[start : start+W]; start += S`` —
preprocessing per SURVEY §2 M2) for arbitrary token arrays and geometry.
The fixed-geometry path is oracle-checked (pipeline_token_windows); this
drives random (window_size, stride) combinations the fixtures never hit.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cinegraph_spark.operators.windowize import windowize


def _reference(tokens: list[str], w: int, s: int):
    out, start, wid = [], 0, 0
    while start < len(tokens):
        end = min(start + w, len(tokens))
        out.append((wid, start, end, tokens[start:end]))
        start += s
        wid += 1
    return out


@settings(max_examples=20, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["x", "y", "z"]), min_size=0, max_size=20),
        min_size=1,
        max_size=6,
    ),
    w=st.integers(1, 8),
    s=st.integers(1, 8),
)
def test_windowize_matches_reference_loop(spark, docs, w, s):
    df = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(docs)],
        "doc_id long, tokens array<string>",
    )
    rows = windowize(
        df, "doc_id", window_size=w, stride=s, keep_tokens=True
    ).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["window_id"], r["window_start"], r["window_end"],
             r["window_tokens"])
        )
    for d in got:
        got[d].sort()
    want = {
        i: _reference(toks, w, s) for i, toks in enumerate(docs) if toks
    }
    assert got == want
