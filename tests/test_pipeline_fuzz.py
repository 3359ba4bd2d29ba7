"""Property-based differential tests for the pipeline operators —
random inputs driven through the Spark operator AND a trivially-correct
pure-Python reference, the same strategy the store fuzzers use with the
reference library (tests/test_store_fuzz.py)."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    # derandomize: the suite's pass/fail must not depend on the draw
    # (round-5 verdict: an unseeded fuzzer shipped a false 'full green')
    derandomize=True,
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),        # user
        st.integers(min_value=0, max_value=20000),    # sec
        st.integers(min_value=-100, max_value=100),   # value (int-exact)
    ),
    min_size=1,
    max_size=60,
)


def _py_sessions(rows, gap, exclusive):
    """Reference sessionizer: per-user sorted scan."""
    out = {}
    by_user = {}
    for (u, s, v) in rows:
        by_user.setdefault(u, []).append((s, v))
    for u, evs in by_user.items():
        evs.sort()
        sid = 0
        prev = None
        for (s, v) in evs:
            broke = prev is None or ((s - prev > gap) if exclusive else (s - prev >= gap))
            if broke:
                sid += 1
                out[(u, sid)] = [0, s, s, 0.0]
            agg = out[(u, sid)]
            agg[0] += 1
            agg[1] = min(agg[1], s)
            agg[2] = max(agg[2], s)
            agg[3] += v
            prev = s
    return {
        k: (n, lo, hi, sv) for k, (n, lo, hi, sv) in out.items()
    }


@given(rows=events_strategy, gap=st.integers(min_value=1, max_value=4000),
       exclusive=st.booleans())
@settings(**SETTINGS)
def test_sessionize_batch_matches_python(spark, rows, gap, exclusive):
    from whisper_spark.operators.sessions import sessionize_batch

    df = spark.createDataFrame(
        [(u, s, float(v)) for (u, s, v) in rows],
        "user_id int, sec long, value double",
    )
    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["t_start"], r["t_end"], r["sum_value"]
        )
        for r in sessionize_batch(
            df, gap_seconds=gap, gap_exclusive=exclusive
        ).collect()
    }
    want = _py_sessions(rows, gap, exclusive)
    assert set(got) == set(want)
    for k in want:
        gn, glo, ghi, gsv = got[k]
        wn, wlo, whi, wsv = want[k]
        assert (gn, glo, ghi) == (wn, wlo, whi), k
        assert math.isclose(gsv, wsv, rel_tol=0, abs_tol=1e-9), k


docs_strategy = st.lists(
    st.tuples(
        st.text(alphabet="ab c", min_size=0, max_size=40),  # text
        st.sampled_from(["s1", "s2"]),                      # source
    ),
    min_size=1,
    max_size=40,
)


@given(docs=docs_strategy, cap=st.integers(min_value=1, max_value=30))
@settings(**SETTINGS)
def test_pack_bins_matches_python(spark, docs, cap):
    """Token-budget chunking: bin = preceding cumulative tokens // cap,
    per source shard, docs ordered by doc_id."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(i, src, text) for i, (text, src) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    n_tokens = F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != "")).cast(
        "long"
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["bin_id"])
        for r in df.select("doc_id", "source", n_tokens.alias("n_tokens"))
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(cap)).alias("bin_id"),
            "n_tokens",
        )
        .collect()
    }

    by_src = {}
    for (i, src, text) in rows:
        by_src.setdefault(src, []).append((i, len([t for t in text.split(" ") if t])))
    want = {}
    for src, items in by_src.items():
        cum = 0
        for (i, nt) in sorted(items):
            want[i] = (nt, cum // cap)
            cum += nt
    assert got == want


series_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),        # which metric
        st.integers(min_value=0, max_value=50),       # slot index
        st.integers(min_value=-50, max_value=50),     # value (int-exact)
    ),
    min_size=1,
    max_size=50,
).map(lambda rows: sorted({(m, t): v for m, t, v in rows}.items()))
# one value per (metric, slot), deterministic order


@given(rows=series_strategy,
       bucket=st.sampled_from([120, 180, 300]),
       n_pts=st.integers(min_value=1, max_value=6))
@settings(**SETTINGS)
def test_render_functions_match_python_reference(spark, rows, bucket, n_pts):
    """summarize / moving_window / derivative / integral vs a per-series
    sorted-scan Python reference (integer values => exact equality)."""
    from whisper_spark.functions import timeseries as TS
    from pyspark.sql import functions as F

    data = [(f"m{m}", t * 60, float(v)) for ((m, t), v) in rows]
    df = spark.createDataFrame(data, "metric string, ts long, value double")

    by_series = {}
    for m, t, v in data:
        by_series.setdefault(m, []).append((t, v))
    for s in by_series.values():
        s.sort()

    # summarize(sum)
    got = {(r.metric, r.ts): (r.value, r.known)
           for r in TS.summarize(df, ["metric"], bucket, "sum").collect()}
    exp = {}
    for m, pts in by_series.items():
        for t, v in pts:
            b = t - t % bucket
            s, n = exp.get((m, b), (0.0, 0))
            exp[(m, b)] = (s + v, n + 1)
    assert got == exp

    # moving_window / derivative / integral
    mv = {(r.metric, r.ts): r.mavg
          for r in TS.moving_window(df, ["metric"], n_pts).collect()}
    dv = {(r.metric, r.ts): r.delta
          for r in TS.derivative(df, ["metric"]).collect()}
    ig = {(r.metric, r.ts): r.running
          for r in TS.integral(df, ["metric"]).collect()}
    for m, pts in by_series.items():
        run = 0.0
        for i, (t, v) in enumerate(pts):
            frame = [x for _, x in pts[max(0, i - n_pts + 1): i + 1]]
            assert mv[(m, t)] == sum(frame) / len(frame)
            assert dv[(m, t)] == (None if i == 0 else v - pts[i - 1][1])
            run += v
            assert ig[(m, t)] == run


# --------------------------------------------------------------------- #
# gopher_rules: random texts vs a trivially-correct Python reference
# --------------------------------------------------------------------- #

_gopher_words = st.sampled_from(
    ["the", "of", "and", "that", "have", "with", "zebra", "12345",
     "#tag", "a", "run...", "-", "*", "•item", "x"]
)
_gopher_line = st.lists(_gopher_words, min_size=0, max_size=20).map(" ".join)
_gopher_text = st.lists(_gopher_line, min_size=1, max_size=6).map("\n".join)


def _py_gopher(text):
    toks = [t for t in text.split(" ") if t]
    n = len(toks)
    nz = n if n else 1
    lines = text.split("\n")
    bullets = sum(1 for x in lines
                  if x.lstrip().startswith(("-", "*", "•")))
    ells = sum(1 for x in lines if x.rstrip().endswith("..."))
    alpha = sum(1 for t in toks
                if any(c.isascii() and c.isalpha() for c in t))
    stops = len(set(toks)
                & {"the", "be", "to", "of", "and", "that", "have", "with"})
    mwl = sum(len(t) for t in toks) / nz
    sym = (text.count("#")
           + (len(text) - len(text.replace("...", ""))) / 3) / nz
    return (n, mwl, sym, bullets / len(lines), ells / len(lines),
            alpha / nz, stops,
            50 <= n <= 100_000 and 3 <= mwl <= 10 and sym <= 0.1
            and bullets / len(lines) <= 0.9 and ells / len(lines) <= 0.3
            and alpha / nz >= 0.8 and stops >= 2)


@given(st.lists(_gopher_text, min_size=1, max_size=10))
@settings(**{**SETTINGS, "max_examples": 8})
def test_gopher_rules_random_docs(spark, texts):
    from whisper_spark.operators.textanalysis import gopher_rules

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    for i, text in enumerate(texts):
        n, mwl, sym, bf, ef, af, stops, ok = _py_gopher(text)
        r = got[i]
        assert r["n_words"] == n and r["n_required_stops"] == stops, i
        for col, want in [("mean_word_len", mwl), ("symbol_ratio", sym),
                          ("bullet_line_frac", bf),
                          ("ellipsis_line_frac", ef),
                          ("alpha_word_frac", af)]:
            assert math.isclose(r[col], want, abs_tol=1e-12), (i, col)
        assert bool(r["pass_gopher"]) == ok, (i, text)


# --------------------------------------------------------------------- #
# c4_filters: random line-structured docs vs a Python reference
# --------------------------------------------------------------------- #

_c4_words = st.sampled_from(
    ["the", "cat", "sat.", "ran!", "why?", 'said"', "javascript",
     "Lorem", "ipsum", "{x}", "12345", "a"]
)
_c4_line = st.lists(_c4_words, min_size=0, max_size=8).map(" ".join)
_c4_text = st.lists(_c4_line, min_size=1, max_size=10).map("\n".join)


def _py_c4(text, min_kept=5, min_words=3):
    lines = text.split("\n")
    kept = [x for x in lines
            if x.rstrip()[-1:] in '.!?"'
            and len([w for w in x.split(" ") if w]) >= min_words
            and "javascript" not in x.lower()]
    clean = "\n".join(kept)
    has_lorem = "lorem ipsum" in text.lower()
    has_brace = "{" in text
    return (len(lines), len(kept), len(clean),
            not has_lorem and not has_brace and len(kept) >= min_kept)


@given(st.lists(_c4_text, min_size=1, max_size=10))
@settings(**{**SETTINGS, "max_examples": 8})
def test_c4_filters_random_docs(spark, texts):
    from whisper_spark.operators.textanalysis import c4_filters

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in c4_filters(df).collect()}
    for i, text in enumerate(texts):
        nl, nk, cl, keep = _py_c4(text)
        r = got[i]
        assert (r["n_lines"], r["n_kept"], r["clean_len"],
                bool(r["keep_doc"])) == (nl, nk, cl, keep), (i, text)


# --------------------------------------------------------------------- #
# cdc_incremental_savings: random corpora vs a hashlib reference
# --------------------------------------------------------------------- #

_cdc_text = st.text(
    alphabet="ab !", min_size=0, max_size=120
)


def _cdc_chunks_ref(text, window=16, mask=64):
    import hashlib
    ends = [i for i in range(window, len(text) + 1)
            if int(hashlib.md5(text[i - window:i].encode())
                   .hexdigest()[:2], 16) % mask == 0]
    if not ends or ends[-1] != len(text):
        ends.append(len(text))
    out, s = [], 0
    for e in ends:
        out.append(text[s:e]); s = e
    return out


@given(st.lists(_cdc_text, min_size=1, max_size=6),
       st.lists(_cdc_text, min_size=1, max_size=6))
@settings(**{**SETTINGS, "max_examples": 8})
def test_cdc_incremental_savings_random(spark, new_texts, seen_texts):
    from whisper_spark.operators.dedup import cdc_incremental_savings

    new_rows = [(i, t) for i, t in enumerate(new_texts) if t]
    seen_rows = [(100 + i, t) for i, t in enumerate(seen_texts) if t]
    if not new_rows or not seen_rows:
        return
    got = {r["doc_id"]: r for r in cdc_incremental_savings(
        spark.createDataFrame(new_rows, "doc_id long, text string"),
        spark.createDataFrame(seen_rows, "doc_id long, text string"),
    ).collect()}
    seen_set = {c for _, t in seen_rows for c in _cdc_chunks_ref(t)}
    for i, t in new_rows:
        cs = _cdc_chunks_ref(t)
        dup = [c for c in cs if c in seen_set]
        r = got[i]
        assert (r["n_chunks"], r["total_bytes"],
                r["dup_chunks"], r["dup_bytes"]) == (
            len(cs), sum(len(c) for c in cs),
            len(dup), sum(len(c) for c in dup)), (i, t)
