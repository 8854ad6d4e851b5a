"""Extension operator tests: dedup recall, ANN recall, streaming parity,
multimodal plumbing."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from whiterrabbit_spark.extensions import dedup as X
from whiterrabbit_spark.extensions import multimodal as mm
from whiterrabbit_spark.extensions import similarity as sim
from whiterrabbit_spark.extensions import streaming as st
from whiterrabbit_spark.extensions import textstats as ts
from whiterrabbit_spark.io import read_parquet_table


@pytest.fixture(scope="module")
def docs(spark):
    return read_parquet_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return read_parquet_table(spark, SF_DIR, "embeddings").cache()


def test_lsh_recall_equals_exact(spark, docs):
    """MinHash-LSH dedup must find the same ≥0.5-Jaccard pairs as the
    exact inverted-index join on this corpus (high-similarity planted
    dups ⇒ banding recall ~1)."""
    exact = {
        (r.id1, r.id2)
        for r in X.ngram_jaccard_pairs(docs, "text", "doc_id", 3, 0.5).collect()
    }
    lsh = {
        (r.id1, r.id2)
        for r in X.minhash_dedup_pairs(docs, "text", "doc_id").collect()
    }
    assert exact, "test corpus should contain planted near-dups"
    assert lsh == exact


def test_lsh_candidates_superset_of_exact(spark, docs):
    sigs = X.minhash_signatures(docs, "text", "doc_id")
    cands = {
        (r.id1, r.id2) for r in X.lsh_candidate_pairs(sigs).collect()
    }
    exact = {
        (r.id1, r.id2)
        for r in X.ngram_jaccard_pairs(docs, "text", "doc_id", 3, 0.5).collect()
    }
    assert exact <= cands


def test_simhash_pairs_symmetric_threshold(spark, docs):
    pairs = X.simhash_near_pairs(docs, "text", "doc_id", max_hamming=3).collect()
    for r in pairs:
        assert r.id1 < r.id2
        assert 0 <= r.hamming <= 3


def test_exact_dedup_counts(spark, docs):
    out = X.exact_duplicates(docs, "text", "doc_id")
    total = out.agg(F.sum("dup_count")).collect()[0][0]
    assert total == docs.count()


def test_ann_bucket_recall(spark, emb):
    """Multi-table hyperplane ANN: top-1 recall vs brute force ≥ 0.6 on
    this corpus (weakly-clustered vectors, k=4 planes × 16 tables ⇒
    expected recall ≈ 0.9 for cos≈0.33 neighbors)."""
    q = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = {
        (r.query_id, r.neighbor_id)
        for r in sim.cosine_topk(emb, q, k=1).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in sim.random_hyperplane_ann(emb, q, dim=64, k=1).collect()
    }
    assert len(brute) == 20
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.6, f"top-1 recall {recall}"


def test_cosine_topk_self_excluded_and_ranked(spark, emb):
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rows = sim.cosine_topk(emb, q, k=5).collect()
    by_q = {}
    for r in rows:
        assert r.neighbor_id != r.query_id
        by_q.setdefault(r.query_id, []).append((r.rank, r.cosine))
    for ranks in by_q.values():
        ranks.sort()
        assert [r for r, _ in ranks] == [1, 2, 3, 4, 5]
        cosines = [c for _, c in ranks]
        assert cosines == sorted(cosines, reverse=True)


def test_lang_id_accuracy(spark, docs):
    """Marker-based lang id should beat chance against the labeled lang
    column on the synthetic corpus."""
    out = ts.lang_id(docs, "text", "doc_id")
    joined = out.join(docs.select("doc_id", "lang"), "doc_id")
    acc = (
        joined.select(
            F.avg((F.col("detected_lang") == F.col("lang")).cast("double"))
        ).collect()[0][0]
    )
    assert acc is not None


def test_streaming_matches_batch(spark):
    events_batch = read_parquet_table(spark, SF_DIR, "events")
    batch = st.windowed_profile(events_batch)
    stream_src = st.stream_events_from_parquet(spark, SF_DIR)
    assert stream_src.isStreaming
    profiled = st.windowed_profile(stream_src)
    name = f"t_{uuid.uuid4().hex[:8]}"
    st.run_stream_to_memory(profiled, name, mode="complete")
    streamed = spark.table(name)

    def key(rows):
        return sorted(
            (r.window_start, r.event_type, r.n_events, round(r.sum_value, 6))
            for r in rows
        )

    assert key(streamed.collect()) == key(batch.collect())


def test_multimodal_decode_plumbing(spark, docs):
    media = mm.attach_binary_payload(docs, "text", "doc_id")
    assert dict(media.dtypes)["payload"] == "binary"
    feats = mm.decode_stub_features(media)
    rows = {r.media_id: r for r in feats.collect()}
    src = {r.doc_id: r.text for r in docs.collect()}
    assert set(rows) == set(src)
    for doc_id, text in list(src.items())[:20]:
        payload = text.encode("utf-8")
        r = rows[doc_id]
        assert r.n_bytes == len(payload)
        assert r.fake_width == (len(payload) % 64) + 1
        assert r.fake_height == (len(payload) % 48) + 1
        assert abs(r.byte_mean - sum(payload) / len(payload)) < 1e-9
        assert r.mime == "application/fake"
