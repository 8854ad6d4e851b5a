"""Property-based tests (hypothesis) — SURVEY §5.4.

The inference property checks the engine against an independent pure-Python
model of the reference rule (whiteRRabbit.R:139-204): double iff ≥1
non-empty value and none fail the float parse; else timestamp iff
parse-success over ALL rows ≥ 0.8; else string.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from whiterrabbit_spark.config import ScanConfig
from whiterrabbit_spark.frequency import value_frequencies
from whiterrabbit_spark.infer import infer_and_cast, infer_types
from whiterrabbit_spark.profile import profile_table

CFG = ScanConfig(max_rows=-1)

_num = st.one_of(
    st.integers(-10**6, 10**6).map(str),
    st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False).map(lambda f: f"{f:.4f}"),
    st.floats(-1e3, 1e3, allow_nan=False, allow_infinity=False).map(lambda f: f"{f:.2e}"),
)
_word = st.from_regex(re.compile(r"[a-z]{1,8}"), fullmatch=True)
_date = st.tuples(
    st.integers(2000, 2030), st.integers(1, 12), st.integers(1, 28)
).map(lambda t: f"{t[0]:04d}-{t[1]:02d}-{t[2]:02d}")
_cell = st.one_of(_num, _word, _date, st.just(""), st.none())
_column = st.lists(_cell, min_size=1, max_size=40)


def _py_float_ok(v: str) -> bool:
    s = v.strip()
    if not s or s.lower() in ("inf", "+inf", "-inf", "infinity", "-infinity", "nan"):
        # R/Spark accept these as doubles; keep the model aligned
        return bool(s)
    try:
        float(s)
        return True
    except ValueError:
        return False


_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def _model_decision(values: list[str | None]) -> str:
    nonempty = [v for v in values if v is not None and v != ""]
    if nonempty and all(_py_float_ok(v) for v in nonempty):
        return "double"
    date_ok = sum(1 for v in values if v is not None and _DATE_RE.match(v or ""))
    if values and date_ok / len(values) >= 0.8:
        # model only generates ISO dates; words/numerics never parse as dates
        # (digit-only strings would be caught by the numeric rule first)
        if not (nonempty and all(_py_float_ok(v) for v in nonempty)):
            return "timestamp"
    return "string"


@pytest.mark.usefixtures("spark")
class TestProperties:
    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(values=_column)
    def test_inference_matches_model(self, spark, values):
        df = spark.createDataFrame([(v,) for v in values], "v string")
        got = infer_types(df, CFG).decisions["v"]
        assert got == _model_decision(values)

    @settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
    @given(values=st.lists(_num, min_size=1, max_size=30))
    def test_inference_idempotent(self, spark, values):
        df = spark.createDataFrame([(v,) for v in values], "v string")
        typed, res = infer_and_cast(df, CFG)
        assert res.decisions["v"] == "double"
        restrung = typed.selectExpr("cast(v as string) AS v")
        typed2, res2 = infer_and_cast(restrung, CFG)
        assert res2.decisions["v"] == "double"
        assert sorted(r.v for r in typed.collect()) == sorted(
            r.v for r in typed2.collect()
        )

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(values=st.lists(st.one_of(_word, st.just(""), st.none()), min_size=1, max_size=60))
    def test_freq_invariants(self, spark, values):
        df = spark.createDataFrame([(v,) for v in values], "v string")
        cfg = ScanConfig(min_cell_count=2, max_distinct_values=5)
        rows = value_frequencies(df, cfg=cfg).collect()
        nonmissing = sum(1 for v in values if v)
        assert sum(r["count"] for r in rows) <= nonmissing
        assert all(r["count"] >= 2 for r in rows)
        assert len(rows) <= 5
        if rows:
            assert abs(sum(r["percentage"] for r in rows) - 1.0) < 1e-9

    @settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
    @given(values=_column)
    def test_profile_count_invariants(self, spark, values):
        df = spark.createDataFrame([(v,) for v in values], "v string")
        summary, _ = profile_table(df, CFG)
        r = summary.collect()[0]
        assert r["total_count"] == len(values)
        assert (
            r["missing_count"] + r["empty_count"] + r["non_missing_count"]
            == r["total_count"]
        )
        assert r["distinct_count"] <= max(r["non_missing_count"], 0)


@st.composite
def _texts(draw):
    return draw(
        st.text(
            alphabet=st.sampled_from("abc d.e,f!?\t\n'123"),
            min_size=0,
            max_size=60,
        )
    )


class TestTextstatsProperties:
    @settings(max_examples=12, deadline=None)
    @given(st.lists(_texts(), min_size=1, max_size=8))
    def test_quality_bounded_and_fingerprint_ws_invariant(self, spark, texts):
        from whiterrabbit_spark.extensions import textstats as ts

        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        q = {r.doc_id: r for r in ts.quality_score(df, "text", "doc_id").collect()}
        for r in q.values():
            assert -1e-9 <= r.quality_score <= 1 + 1e-9
            assert r.quality_class in ("keep", "review", "drop")
        # fingerprint is invariant under whitespace runs + case
        import re

        mangled = [
            (i, re.sub(r" ", "   ", t.upper())) for i, t in rows
        ]
        df2 = spark.createDataFrame(mangled, "doc_id long, text string")
        f1 = {r.doc_id: r.fingerprint for r in ts.fingerprint(df, "text", "doc_id").collect()}
        f2 = {r.doc_id: r.fingerprint for r in ts.fingerprint(df2, "text", "doc_id").collect()}
        for i, t in rows:
            # only space-runs are normalized; tabs/newlines also fold via \s+
            assert f1[i] == f2[i]

    @settings(max_examples=12, deadline=None)
    @given(st.lists(_texts(), min_size=1, max_size=8))
    def test_bpe_tokens_cover_nonspace_text(self, spark, texts):
        from whiterrabbit_spark.extensions import textstats as ts
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        out = df.select(
            "doc_id",
            ts.bpe_token_count(F.col("text")).alias("n"),
            F.length(F.regexp_replace("text", r"\s", "")).alias("nonspace"),
        )
        for r in out.collect():
            if r.nonspace == 0:
                assert r.n == 0 or r.n >= 0
            else:
                assert r.n >= 1
                assert r.n <= r.nonspace


@pytest.mark.usefixtures("spark")
class TestTemporalAndPackingProperties:
    """Model-checked properties for the temporal joins and shard packing:
    each operator is replayed by an independent pure-Python model over the
    same randomized inputs."""

    _events = st.lists(
        st.tuples(
            st.integers(0, 3),                 # user/key
            st.integers(0, 10_000),            # epoch seconds
            st.integers(0, 100),               # payload
        ),
        min_size=1, max_size=60,
    )

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(rows=_events)
    def test_asof_matches_model(self, spark, rows):
        from pyspark.sql import functions as F

        from whiterrabbit_spark.extensions import joins as J

        left_rows = rows[::2]
        right_rows = rows[1::2]
        # right must be unique per (key, ts): keep max payload
        rmap: dict[tuple[int, int], int] = {}
        for u, t, v in right_rows:
            rmap[(u, t)] = max(rmap.get((u, t), -1), v)
        if not rmap:
            return
        left = spark.createDataFrame(
            [(u, t, i) for i, (u, t, _) in enumerate(left_rows)],
            "u long, epoch long, idx long",
        ).select("u", F.timestamp_seconds("epoch").alias("ts"), "idx")
        right = spark.createDataFrame(
            [(u, t, v) for (u, t), v in rmap.items()],
            "u long, epoch long, v long",
        ).select("u", F.timestamp_seconds("epoch").alias("ts"), "v")

        got = {
            r["idx"]: (r["right_v"])
            for r in J.asof_join(left, right, time_col="ts", by="u").collect()
        }
        for i, (u, t, _) in enumerate(left_rows):
            cands = [(rt, v) for (ru, rt), v in rmap.items() if ru == u and rt <= t]
            expect = max(cands)[1] if cands else None
            assert got[i] == expect

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        rows=st.lists(st.integers(1, 200), min_size=1, max_size=80),
        budget=st.integers(50, 400),
    )
    def test_pack_shards_matches_model(self, spark, rows, budget):
        from whiterrabbit_spark.extensions import splits as sp

        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(rows)], "doc_id long, w long"
        )
        got = {
            r["doc_id"]: r["shard_id"]
            for r in sp.pack_shards(df, "doc_id", "w", float(budget), 5).collect()
        }
        cum = 0
        for i, w in enumerate(rows):
            assert got[i] == cum // budget
            cum += w
        # shard ids are nondecreasing and contiguous from 0
        seq = [got[i] for i in range(len(rows))]
        assert seq[0] == 0
        assert all(a <= b <= a + max(rows) // budget + 1 for a, b in zip(seq, seq[1:]))


_doc_text = st.lists(_word, min_size=1, max_size=12).map(" ".join)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_doc_text, min_size=1, max_size=12),
       bench_mask=st.lists(st.booleans(), min_size=1, max_size=12))
def test_decontaminate_partitions_corpus(spark, texts, bench_mask):
    """For ANY corpus/benchmark: clean ∪ contaminated = corpus (disjoint),
    and every doc of the benchmark itself flags at threshold ≤ 1 when
    checked against itself (self-contamination totality)."""
    from pyspark.sql import functions as F

    from whiterrabbit_spark.extensions import decontam as dc

    corpus = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    picks = [i for i, b in zip(range(len(texts)), bench_mask) if b] or [0]
    bench = corpus.where(F.col("doc_id").isin(picks))

    clean, cont = dc.decontaminate(corpus, bench, k=3, threshold=0.5)
    clean_ids = {r.doc_id for r in clean.collect()}
    cont_ids = {r.doc_id for r in cont.collect()}
    assert clean_ids | cont_ids == set(range(len(texts)))
    assert clean_ids.isdisjoint(cont_ids)
    # benchmark docs checked against themselves always flag (frac = 1)
    self_stats = dc.contamination_stats(bench, bench, k=3)
    assert all(r.overlap_frac == 1.0 for r in self_stats.collect())


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(counts=st.lists(st.integers(1, 60), min_size=2, max_size=5))
def test_temperature_mixture_rates_monotone(spark, counts):
    """For ANY domain-size profile: every domain keeps ≤ its input count,
    the smallest domain keeps everything, and kept-count ordering never
    inverts the input ordering by more than hash-threshold granularity
    (larger domains never keep FEWER rows than an equal-or-larger rate
    would give a smaller domain)."""
    from pyspark.sql import functions as F

    from whiterrabbit_spark.extensions import splits as sp

    rows = [
        (d * 1000 + i, f"dom{d}")
        for d, n in enumerate(counts)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "domain"])
    out = sp.temperature_mixture(df, "domain", "doc_id", alpha=0.5)
    kept = {r["domain"]: r["k"] for r in
            out.groupBy("domain").agg(F.count(F.lit(1)).alias("k")).collect()}
    n_by_dom = {f"dom{d}": n for d, n in enumerate(counts)}
    for dom, n in n_by_dom.items():
        assert kept.get(dom, 0) <= n
    smallest = min(n_by_dom, key=lambda d: (n_by_dom[d], d))
    assert kept.get(smallest, 0) == n_by_dom[smallest]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "", "  ", "x y"]),
            min_size=0,
            max_size=5,
        ).map(lambda ls: "\n".join(ls)),
        min_size=1,
        max_size=8,
    )
)
def test_line_dedup_matches_model(spark, docs):
    """line_dedup against a pure-Python model: first (id, pos) occurrence
    of each non-trivial line survives, trivial (blank after trim) lines
    always survive, reassembly preserves order."""
    from whiterrabbit_spark.extensions.dedup import line_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in line_dedup(df).collect()}

    seen: set[str] = set()
    for i, t in enumerate(docs):
        lines = t.split("\n")
        kept, removed = [], 0
        for ln in lines:
            if len(ln.strip()) < 1:
                kept.append(ln)
            elif ln not in seen:
                seen.add(ln)
                kept.append(ln)
            else:
                removed += 1
        assert got[i].text == "\n".join(kept), (i, docs)
        assert got[i].n_lines == len(lines)
        assert got[i].n_removed == removed


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=6
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_dup_ngram_stats_matches_model(spark, docs):
    """dup_ngram_stats against a pure-Python model over tiny vocabularies
    (the worst case for shingle collisions)."""
    from whiterrabbit_spark.extensions.dedup import dup_ngram_stats

    k = 2
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )

    def shingles(t: str) -> set[str]:
        w = t.split()
        n = max(len(w) - (k - 1), 1)
        return {" ".join(w[i : i + k]) for i in range(n)}

    sets = {i: shingles(t) for i, t in enumerate(docs)}
    freq: dict[str, int] = {}
    for ss in sets.values():
        for sh in ss:
            freq[sh] = freq.get(sh, 0) + 1
    got = {r.doc_id: r for r in dup_ngram_stats(df, k=k).collect()}
    for i, ss in sets.items():
        dup = sum(1 for sh in ss if freq[sh] >= 2)
        assert got[i].n_shingles == len(ss)
        assert got[i].n_dup_shingles == dup
