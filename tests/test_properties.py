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

from pyspark.sql import functions as F

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


# --- round-2 operator properties -----------------------------------------


@given(
    keys=st.lists(st.integers(0, 400), min_size=1, max_size=60),
    n_buckets=st.integers(1, 12),
)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_sequence_gaps_matches_model(spark, keys, n_buckets):
    """Bucketed gap stats == a pure-Python single-pass model, for any
    bucket count (bucketing is a parallelism choice, never a semantic
    one)."""
    from whiterrabbit_spark.profile import sequence_gaps

    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    r = sequence_gaps(df, "k", n_buckets=n_buckets).collect()[0]

    ks = sorted(set(keys))
    gaps = [b - a - 1 for a, b in zip(ks, ks[1:]) if b - a > 1]
    assert r.min_key == ks[0] and r.max_key == ks[-1]
    assert r.n_keys == len(ks)
    assert r.n_missing == sum(gaps)
    assert r.n_gaps == len(gaps)
    assert r.max_gap == (max(gaps) if gaps else 0)


@given(
    vals=st.lists(
        st.one_of(
            st.from_regex(re.compile(r"[A-Za-z0-9#\-./]{1,12}"), fullmatch=True),
            st.just(""), st.none(),
        ),
        min_size=1, max_size=40,
    )
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_mask_profile_invariants(spark, vals):
    """Counts cover exactly the non-empty values; shares sum to ≤1 with
    equality when top_k doesn't truncate; masking is idempotent."""
    from whiterrabbit_spark.frequency import mask_profile

    df = spark.createDataFrame([(v,) for v in vals], "s string")
    out = mask_profile(df, ["s"], top_k=1000).collect()
    n_nonempty = sum(1 for v in vals if v)
    if n_nonempty == 0:
        assert out == []
        return
    assert sum(r["count"] for r in out) == n_nonempty
    assert abs(sum(r.share for r in out) - 1.0) < 1e-9
    table = str.maketrans(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789",
        "A" * 26 + "a" * 26 + "9" * 10,
    )
    for r in out:
        assert r.mask.translate(table) == r.mask  # idempotent
        assert set(r.mask_collapsed) <= set(r.mask)


@given(
    pairs=st.lists(
        st.tuples(st.sampled_from("abc"), st.sampled_from("xyz")),
        min_size=2, max_size=50,
    )
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_mutual_information_bounds(spark, pairs):
    """0 ≤ MI, and MI ≤ min(H(A), H(B)) + float slack; normalized form in
    [0, 1] when defined."""
    import math

    from whiterrabbit_spark.profile import mutual_information

    df = spark.createDataFrame(pairs, "a string, b string")
    r = mutual_information(df, [("a", "b")]).collect()[0]

    def entropy(xs):
        n = len(xs)
        from collections import Counter
        return -sum((c / n) * math.log(c / n) for c in Counter(xs).values())

    ha = entropy([a for a, _ in pairs])
    hb = entropy([b for _, b in pairs])
    assert r.mi >= 0
    assert r.mi <= min(ha, hb) + 1e-9
    if r.mi_norm is not None:
        assert -1e-9 <= r.mi_norm <= 1 + 1e-9


@given(
    snaps=st.lists(
        st.tuples(st.integers(1, 3), st.integers(1, 6), st.sampled_from("pq")),
        min_size=1, max_size=40, unique_by=lambda t: (t[0], t[1]),
    )
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_scd2_intervals_partition_history(spark, snaps):
    """Per key: intervals are disjoint, ordered, and exactly one NULL
    valid_to iff the key is present in the final snapshot."""
    import datetime as dt

    from whiterrabbit_spark.extensions.diff import scd2_history

    date_of = {i: dt.date(2026, i, 1) for i in (1, 2, 3)}
    rows = [(date_of[s], k, v) for s, k, v in snaps]
    df = spark.createDataFrame(rows, "snap date, k int, v string")
    out = scd2_history(df, "k", "snap", ["v"]).collect()

    last_snap = max(r[0] for r in rows)
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    present_last = {k for s, k, _ in rows if s == last_snap}
    for k, ivals in by_key.items():
        ivals.sort(key=lambda r: r.valid_from)
        for a, b in zip(ivals, ivals[1:]):
            assert a.valid_to is not None and a.valid_to <= b.valid_from
        currents = [r for r in ivals if r.valid_to is None]
        assert len(currents) == (1 if k in present_last else 0)
        assert all(r.is_current == (r.valid_to is None) for r in ivals)


@given(
    vals=st.lists(
        st.one_of(
            st.floats(min_value=-1e6, max_value=1e6,
                      allow_nan=False, allow_infinity=False),
            st.none(),
        ),
        min_size=1, max_size=60,
    ),
    groups=st.integers(1, 3),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_grouped_quantiles_match_numpy(spark, vals, groups):
    """Per-group quartiles equal numpy's linear (type-7) percentiles over
    the group's non-null values."""
    import numpy as np

    from whiterrabbit_spark.profile import grouped_quantiles

    rows = [(i % groups, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g int, v double")
    out = {r.group_key: r for r in grouped_quantiles(df, "g", "v").collect()}
    for g in range(groups):
        member = [v for i, v in enumerate(vals) if i % groups == g and v is not None]
        if not member:
            assert g not in out
            continue
        exp = np.percentile(member, [25, 50, 75])
        got = (out[g].q_0_25, out[g].q_0_5, out[g].q_0_75)
        assert all(abs(a - b) < 1e-9 * max(1.0, abs(b)) for a, b in zip(got, exp))


@given(
    rows=st.lists(
        st.tuples(st.booleans(), st.booleans()), min_size=1, max_size=40
    )
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_missingness_shares_sum_to_one(spark, rows):
    from whiterrabbit_spark.profile import missingness_patterns

    data = [(1 if not ma else None, "x" if not mb else None) for ma, mb in rows]
    df = spark.createDataFrame(data, "a int, b string")
    out = missingness_patterns(df, ["a", "b"]).collect()
    assert abs(sum(r.share for r in out) - 1.0) < 1e-9
    assert sum(r.n_rows for r in out) == len(rows)
    # patterns are mutually exclusive labels of the input rows
    from collections import Counter

    exp = Counter(
        f"a={int(ma)},b={int(mb)}" for ma, mb in rows
    )
    assert {r.pattern: r.n_rows for r in out} == dict(exp)


@given(
    vals=st.lists(
        st.floats(min_value=-100, max_value=100,
                  allow_nan=False, allow_infinity=False),
        min_size=2, max_size=50,
    )
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ecdf_distributed_matches_simple(spark, vals):
    """The bucketed prefix-sum ECDF equals the histogram-window ECDF on
    arbitrary value distributions (incl. heavy duplication and
    single-value columns)."""
    from whiterrabbit_spark.profile import ecdf_lookup

    df = spark.createDataFrame([(v,) for v in vals + vals[:3]], "v double")
    simple = {r.v: round(r.cume_dist, 9)
              for r in ecdf_lookup(df, "v").collect()}
    dist = {r.v: round(r.cume_dist, 9)
            for r in ecdf_lookup(df, "v", max_single_reducer=0).collect()}
    assert simple == dist


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3),
                  st.sampled_from(["view", "click", "buy"])),
        min_size=1, max_size=60,
    )
)
def test_attribution_credit_conservation(spark, rows):
    """Σ first_touch_credits = Σ last_touch_credits = #conversions, for
    any event soup (including the (none) channel)."""
    from whiterrabbit_spark.extensions.sequences import attribution

    ev = spark.createDataFrame(
        [(i, u, f"2024-01-01 {h:02d}:00:00", t)
         for i, (u, h, t) in enumerate(rows)],
        "event_id long, user_id long, ts string, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = attribution(ev, "buy").collect()
    n_conv = sum(1 for _, _, t in rows if t == "buy")
    assert sum(r["first_touch_credits"] for r in out) == n_conv
    assert sum(r["last_touch_credits"] for r in out) == n_conv


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=24).map(
            lambda ws: " ".join(ws)
        ),
        min_size=1, max_size=12,
    )
)
def test_span_dedup_idempotent_and_conserving(spark, texts):
    """Scrubbing an already-scrubbed text removes nothing more, and
    kept+removed always equals total chunks."""
    from whiterrabbit_spark.extensions.dedup import span_dedup

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    once = span_dedup(df, "text", "doc_id", k=2)
    rows = once.collect()
    for r in rows:
        n_kept_chunks = (
            len(r["text_scrubbed"].split(" ")) if r["text_scrubbed"] else 0
        )
        assert 0 <= r["n_removed"] <= r["n_chunks"]
    again = span_dedup(
        once.select("doc_id", F.col("text_scrubbed").alias("text")),
        "text", "doc_id", k=2,
    )
    assert all(r["n_removed"] == 0 for r in again.collect())


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(st.integers(0, 30), min_size=5, max_size=300),
    nparts=st.sampled_from([1, 3, 8]),
)
def test_heavy_hitters_partition_invariant(spark, vals, nparts):
    """The exact answer must not depend on how rows are partitioned
    (the MG summaries do; the verify pass erases that)."""
    import math as m

    from whiterrabbit_spark.profile import heavy_hitters

    df = spark.createDataFrame(
        [(v,) for v in vals], "v long"
    ).repartition(nparts)
    phi = 0.15
    got = sorted(
        (r["value"], r["n"]) for r in heavy_hitters(df, "v", phi).collect()
    )
    from collections import Counter

    c = Counter(vals)
    thr = m.ceil(phi * len(vals))
    want = sorted((v, n) for v, n in c.items() if n >= thr)
    assert got == want


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 10**6)),
        min_size=1, max_size=60,
    ),
    k=st.integers(1, 8),
)
def test_balanced_sample_properties(spark, rows, k):
    """Exactly min(k, |class|) rows per class; the two-phase plan equals
    the naive single-window md5 order (slack high enough here that the
    prefilter keeps everything)."""
    from whiterrabbit_spark.extensions.splits import balanced_sample

    df = spark.createDataFrame(
        [(c, i, v) for i, (c, v) in enumerate(rows)],
        "cls string, idx long, v long",
    )
    out = balanced_sample(df, "cls", k=k, slack=10_000.0).collect()
    from collections import Counter

    per_class_in = Counter(c for c, _ in rows)
    per_class_out = Counter(r["cls"] for r in out)
    for c, n in per_class_in.items():
        assert per_class_out[c] == min(k, n)
    for r in out:
        assert 1 <= r["sample_rank"] <= k


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    weights=st.lists(st.floats(0.01, 100.0), min_size=2, max_size=30),
)
def test_pareto_share_is_monotone_and_bounded(spark, weights):
    """Pareto share is nondecreasing in pct, ends at 1.0, and the top-p%
    share is always >= p% (sorted-desc prefix dominates the mean)."""
    from whiterrabbit_spark.profile import pareto_concentration

    df = spark.createDataFrame(
        [(f"k{i}", float(w)) for i, w in enumerate(weights)],
        "k string, w double",
    )
    rows = sorted(
        pareto_concentration(
            df, "k", "w", pcts=[10.0, 30.0, 60.0, 100.0]
        ).collect(),
        key=lambda r: r["pct_keys"],
    )
    shares = [r["weight_share"] for r in rows]
    assert shares == sorted(shares)
    assert abs(shares[-1] - 1.0) < 1e-9
    for r in rows:
        assert r["weight_share"] >= r["pct_keys"] / 100.0 - 1e-6


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    days=st.lists(
        st.tuples(st.integers(1, 20), st.integers(1, 5)),
        min_size=1, max_size=50,
    ),
    win=st.integers(1, 5),
)
def test_rolling_distinct_dominates_daily(spark, days, win):
    """Rolling N-day distinct >= that day's own distinct, and never
    exceeds the global distinct count."""
    from whiterrabbit_spark.profile import rolling_distinct_daily

    rows = [(f"2024-02-{d:02d}", u) for d, u in days]
    df = spark.createDataFrame(rows, "ts string, u long").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {
        r["day"]: r["rolling_distinct"]
        for r in rolling_distinct_daily(df, "ts", "u", win).collect()
    }
    from collections import defaultdict

    daily = defaultdict(set)
    for d, u in days:
        daily[f"2024-02-{d:02d}"].add(u)
    total = len({u for _, u in days})
    for day, users in daily.items():
        assert len(users) <= out[day] <= total


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(
        st.floats(-1e3, 1e3, allow_nan=False, allow_infinity=False),
        min_size=1, max_size=25,
    ),
)
def test_ewma_stays_in_running_envelope(spark, vals):
    """EWMA (adjust=True) is a convex combination of the prefix values:
    min(prefix) <= ewma_t <= max(prefix)."""
    from whiterrabbit_spark.profile import ewma_daily

    rows = [(f"2024-03-{i+1:02d}", float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "ts string, value double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = ewma_daily(df, "ts", "value", alpha=0.4).orderBy("day").collect()
    lo, hi = float("inf"), float("-inf")
    for r, v in zip(out, vals):
        lo, hi = min(lo, v), max(hi, v)
        assert lo - 1e-6 <= r["ewma"] <= hi + 1e-6


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    ref_vals=st.lists(st.floats(0, 100, allow_nan=False), min_size=5, max_size=60),
    cur_vals=st.lists(st.floats(0, 100, allow_nan=False), min_size=5, max_size=60),
)
def test_jsd_hellinger_bounds_property(spark, ref_vals, cur_vals):
    """For ANY two samples: 0 <= JSD <= ln2, 0 <= Hellinger <= 1, and
    both are exactly 0 when cur == ref."""
    import math

    from whiterrabbit_spark.profile import jsd_drift

    ref = spark.createDataFrame([(v,) for v in ref_vals], "v double")
    cur = spark.createDataFrame([(v,) for v in cur_vals], "v double")
    r = jsd_drift(ref, cur, ["v"], bins=7).collect()[0]
    assert -1e-12 <= r["jsd"] <= math.log(2) + 1e-9
    assert -1e-12 <= r["hellinger"] <= 1.0 + 1e-9
    same = jsd_drift(ref, ref, ["v"], bins=7).collect()[0]
    assert abs(same["jsd"]) < 1e-12 and abs(same["hellinger"]) < 1e-12


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    keys=st.lists(st.integers(0, 30), min_size=10, max_size=150),
    width=st.sampled_from([4, 16, 512]),
)
def test_cms_one_sided_property(spark, keys, width):
    """CMS overestimate is one-sided for ANY key distribution and ANY
    sketch width: estimate >= exact, always."""
    from whiterrabbit_spark.profile import cms_estimate_report

    df = spark.createDataFrame([(f"k{k}",) for k in keys], "v string")
    out = cms_estimate_report(df, "v", depth=3, width=width, top_k=50).collect()
    assert out, "non-empty input must produce rows"
    for r in out:
        assert r["cms_n"] >= r["exact_n"]
        assert r["overestimate"] == r["cms_n"] - r["exact_n"]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 500), st.floats(1, 1000, allow_nan=False)),
        min_size=20, max_size=120, unique_by=lambda t: t[0],
    ),
)
def test_mde_positive_and_qte_monotone_property(spark, vals):
    """For ANY per-unit outcome set with both arms populated: MDE > 0,
    and per-arm QTE quantiles are monotone nondecreasing in q."""
    import pyspark.sql.functions as F

    from whiterrabbit_spark.profile import (
        mde_report,
        quantile_treatment_effects,
    )

    df = spark.createDataFrame(vals, "u long, v double")
    out = quantile_treatment_effects(df, "u", F.col("v"), F.lit(True)).collect()
    qa = [r.q_a for r in out if r.q_a is not None]
    qb = [r.q_b for r in out if r.q_b is not None]
    assert qa == sorted(qa) and qb == sorted(qb)
    m = mde_report(df, "u", F.col("v"), F.lit(True)).collect()[0]
    if m.n_a > 1 and m.n_b > 1 and (m.sd_a or 0) + (m.sd_b or 0) > 0:
        assert m.mde_abs > 0


class TestBandedHammingExactness:
    """hash_near_pairs' pigeonhole contract: with 4 bands over 64 bits,
    the banded join finds EXACTLY the pairs within Hamming <= 3 that a
    brute-force quadratic comparison finds — for arbitrary signatures."""

    @given(
        st.lists(
            st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
            min_size=2, max_size=24, unique=True,
        ),
        st.data(),
    )
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_matches_brute_force(self, spark, hashes, data):
        from whiterrabbit_spark.extensions import multimodal as mm

        # plant a near-dup: clone one hash with <=3 flipped bits
        base = hashes[0]
        flips = data.draw(st.sets(st.integers(0, 63), min_size=0, max_size=3))
        clone = base
        for b in flips:
            clone ^= 1 << b
            if clone >= 1 << 63:
                clone -= 1 << 64
            elif clone < -(1 << 63):
                clone += 1 << 64
        sigs_py = list(dict.fromkeys(hashes + [clone]))
        rows = [(i, h) for i, h in enumerate(sigs_py)]
        sigs = spark.createDataFrame(rows, "media_id long, h long")
        got = {
            (r["id1"], r["id2"]): r["hamming"]
            for r in mm.hash_near_pairs(sigs, "media_id", "h", 3, 4).collect()
        }
        want = {}
        for i, a in rows:
            for j, b in rows:
                if i < j:
                    ham = bin((a ^ b) & ((1 << 64) - 1)).count("1")
                    if ham <= 3:
                        want[(i, j)] = ham
        assert got == want


class TestKeepBestDedup:
    """Cluster-argmax contract of dedup.keep_best_dedup: exactly one
    member kept per cluster — the (rounded score, -id) maximum — and
    every unpaired id passes through kept with a NULL cluster."""

    @given(
        n=st.integers(min_value=2, max_value=20),
        edges=st.data(),
    )
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_one_winner_per_cluster(self, spark, n, edges):
        from whiterrabbit_spark.extensions.dedup import keep_best_dedup

        pair_list = edges.draw(
            st.lists(
                st.tuples(st.integers(0, n - 1), st.integers(0, n - 1))
                .filter(lambda p: p[0] != p[1])
                .map(lambda p: (min(p), max(p))),
                max_size=n,
                unique=True,
            )
        )
        scores = edges.draw(
            st.lists(
                st.floats(0, 1, allow_nan=False, width=32),
                min_size=n, max_size=n,
            )
        )
        scored = spark.createDataFrame(
            [(i, float(s)) for i, s in enumerate(scores)],
            "doc_id long, score double",
        )
        pairs = spark.createDataFrame(
            pair_list or [(None, None)], "id1 long, id2 long"
        ).where(F.col("id1").isNotNull())
        out = {r["doc_id"]: r for r in
               keep_best_dedup(scored, pairs, "doc_id", "score").collect()}
        assert set(out) == set(range(n))

        # python-side reference clustering
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pair_list:
            parent[find(a)] = find(b)
        clusters: dict[int, list[int]] = {}
        for i in range(n):
            clusters.setdefault(find(i), []).append(i)
        for members in clusters.values():
            kept = [i for i in members if out[i]["kept"]]
            if len(members) == 1:
                assert kept == members
                assert out[members[0]]["cluster_id"] is None
            else:
                want = max(
                    members,
                    key=lambda i: (round(scores[i], 6), -i),
                )
                assert kept == [want]
                cids = {out[i]["cluster_id"] for i in members}
                assert cids == {min(members)}


class TestCurriculumStages:
    """curriculum_stages is an exact quantile bucketing: stages are
    monotone in score, and the threshold set matches numpy's type-7
    quantiles of the 6-dp-rounded scores."""

    @given(scores=st.lists(
        st.floats(0, 100, allow_nan=False, width=32),
        min_size=4, max_size=40,
    ))
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_matches_numpy_type7(self, spark, scores):
        import numpy as np

        from whiterrabbit_spark.extensions.splits import curriculum_stages

        df = spark.createDataFrame(
            [(i, float(s)) for i, s in enumerate(scores)],
            "doc_id long, score double",
        )
        out = {r["doc_id"]: r["stage"] for r in
               curriculum_stages(df, "score", "doc_id", n_stages=4).collect()}
        r6 = np.round(np.array(scores, dtype=np.float64), 6)
        cuts = [round(float(np.quantile(r6, p)), 6) for p in (0.25, 0.5, 0.75)]
        for i, s in enumerate(r6):
            want = 1 + sum(s > c for c in cuts)
            assert out[i] == want, (i, s, cuts)


class TestGroupedWeightedMedian:
    """The lower weighted median must match a naive python fold: the
    smallest value whose cumulative weight (values ascending, ties
    pre-merged) reaches half the total."""

    @given(rows=st.lists(
        st.tuples(
            st.integers(0, 8),                      # value (small -> ties)
            st.integers(1, 9),                      # weight
        ),
        min_size=1, max_size=30,
    ))
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_matches_naive(self, spark, rows):
        from whiterrabbit_spark.profile import grouped_weighted_median

        df = spark.createDataFrame(
            [("g", float(v), float(w)) for v, w in rows],
            "g string, v double, w double",
        )
        got = grouped_weighted_median(df, "g", "v", "w").collect()[0]

        agg = {}
        for v, w in rows:
            agg[v] = agg.get(v, 0) + w
        total = sum(agg.values())
        cum = 0.0
        want = None
        for v in sorted(agg):
            cum += agg[v]
            if cum >= total / 2:
                want = float(v)
                break
        assert got.weighted_median == want
        assert abs(got.total_weight - total) < 1e-9


class TestEpisodePairs:
    """Pair support must equal the brute-force 'exists an a-event
    strictly before a b-event' count over per-user sequences."""

    @given(events=st.lists(
        st.tuples(
            st.integers(0, 3),                      # user
            st.integers(0, 50),                     # second offset
            st.sampled_from(["A", "B", "C"]),       # type
        ),
        min_size=1, max_size=40,
    ))
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_matches_brute_force(self, spark, events):
        from collections import defaultdict

        from whiterrabbit_spark.extensions.sequences import episode_pairs

        df = spark.createDataFrame(
            [(f"u{u}", 1_700_000_000 + t, ty) for u, t, ty in events],
            "user_id string, sec long, event_type string",
        ).select(
            "user_id",
            F.timestamp_seconds("sec").alias("ts"),
            "event_type",
        )
        got = {
            (r.type_a, r.type_b): (r.n_users_both, r.n_users_ordered)
            for r in episode_pairs(df).collect()
        }

        seqs = defaultdict(list)
        for u, t, ty in events:
            seqs[u].append((t, ty))
        types = sorted({ty for _, _, ty in events})
        for a in types:
            for b in types:
                if a == b:
                    continue
                both = ordered = 0
                for sq in seqs.values():
                    ts_a = [t for t, ty in sq if ty == a]
                    ts_b = [t for t, ty in sq if ty == b]
                    if ts_a and ts_b:
                        both += 1
                        if min(ts_a) < max(ts_b):
                            ordered += 1
                if ordered >= 1:
                    assert got[(a, b)] == (both, ordered), (a, b)
                else:
                    assert (a, b) not in got


class TestDuplicatedSpanCoverage:
    """Property pin for the exact-substring coverage rollup: against a
    brute-force python reference on arbitrary small corpora — coverage
    fraction in [0, 1], interval union computed exactly, docs under k
    tokens or with no cross-doc span always 0."""

    @given(
        st.lists(
            st.lists(
                st.sampled_from(list("abcdef")), min_size=1, max_size=12
            ),
            min_size=1,
            max_size=10,
        )
    )
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_matches_brute_force(self, spark, corpora):
        from whiterrabbit_spark.extensions.dedup import (
            duplicated_span_coverage,
        )

        k = 3
        docs = [(i, " ".join(toks), "s") for i, toks in enumerate(corpora)]
        df = spark.createDataFrame(
            docs, "doc_id long, text string, source string"
        )
        got = duplicated_span_coverage(df, k=k).collect()[0]

        # brute force: spans per doc, cross-doc duplicated hash set,
        # interval union per doc
        spans = {
            i: [tuple(t[j:j + k]) for j in range(len(t) - k + 1)]
            for i, t in ((i, toks) for i, toks in enumerate(corpora))
        }
        docs_of = {}
        for i, ss in spans.items():
            for s in set(ss):
                docs_of.setdefault(s, set()).add(i)
        dup = {s for s, ds in docs_of.items() if len(ds) >= 2}
        fracs = []
        for i, toks in enumerate(corpora):
            pos = sorted(
                j for j, s in enumerate(spans[i]) if s in dup
            )
            cov = prev = None
            total = 0
            for p in pos:
                total += k if prev is None else min(p - prev, k)
                prev = p
            fracs.append(total / max(len(toks), 1))
        assert got["n_docs"] == len(corpora)
        assert got["docs_with_dups"] == sum(1 for f in fracs if f > 0)
        assert abs(got["mean_dup_frac"] - round(sum(fracs) / len(fracs), 6)) < 1e-6
        assert abs(got["max_dup_frac"] - round(max(fracs), 6)) < 1e-6
        assert 0.0 <= got["max_dup_frac"] <= 1.0
