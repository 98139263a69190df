"""Late-r4 operators: cohort retention, RAG chunking, deterministic
random projection, ANN recall evaluation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sfa_spark.operators.corpus import chunk_documents
from sfa_spark.operators.similarity import random_projection
from sfa_spark.operators.temporal import retention

DAY = 86_400_000_000_000


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts long")


def test_retention_triangle(spark):
    # u1 active days 0,1,3; u2 days 1,1,2 (dup same-day collapses);
    # u3 day 3 only
    ev = _events(
        spark,
        [
            (1, 0), (1, DAY + 5), (1, 3 * DAY),
            (2, DAY), (2, DAY + 7), (2, 2 * DAY),
            (3, 3 * DAY + 1),
        ],
    )
    out = {
        (r["cohort"], r["day_offset"]): r["n_active"]
        for r in retention(ev, "user_id", "ts", DAY).collect()
    }
    assert out == {
        (0, 0): 1, (0, 1): 1, (0, 3): 1,
        (1, 0): 1, (1, 1): 1,
        (3, 0): 1,
    }


def test_retention_offset0_counts_all_users(spark):
    rng = np.random.default_rng(7)
    rows = [
        (int(u), int(d) * DAY + int(rng.integers(0, DAY)))
        for u in range(40)
        for d in rng.integers(0, 10, size=rng.integers(1, 6))
    ]
    ev = _events(spark, rows)
    res = retention(ev, "user_id", "ts", DAY).collect()
    assert sum(r["n_active"] for r in res if r["day_offset"] == 0) == 40
    # a cohort is never larger at a later offset than at offset 0
    size0 = {r["cohort"]: r["n_active"] for r in res if r["day_offset"] == 0}
    assert all(r["n_active"] <= size0[r["cohort"]] for r in res)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunk_documents_disjoint_reconstructs(spark):
    texts = ["a b c d e f g", "x y", "q"]
    d = chunk_documents(_docs(spark, texts), chunk_tokens=3, stride=3)
    rows = sorted(d.collect(), key=lambda r: (r["doc_id"], r["chunk_id"]))
    recon = {}
    for r in rows:
        recon.setdefault(r["doc_id"], []).append(r["chunk_text"])
    assert {i: " ".join(c) for i, c in recon.items()} == dict(enumerate(texts))


def test_chunk_documents_overlap_covers_every_token(spark):
    text = " ".join(f"t{i}" for i in range(50))
    rows = chunk_documents(
        _docs(spark, [text]), chunk_tokens=8, stride=5
    ).collect()
    covered = set()
    for r in rows:
        assert r["chunk_id"] == r["start_tok"] // 5
        assert r["chunk_len"] == len(r["chunk_text"].split(" "))
        assert r["chunk_len"] <= 8
        covered.update(range(r["start_tok"], r["start_tok"] + r["chunk_len"]))
    assert covered == set(range(50))


def test_chunk_documents_plan_has_no_exchange(spark):
    d = chunk_documents(_docs(spark, ["a b c"]), chunk_tokens=2, stride=1)
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def _sign(j, k, K=16):
    return 1 - 2 * ((((j * K + k) * 2654435761) % 4294967296 >> 16) % 2)


def test_random_projection_matches_numpy(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((5, 12)).astype("float64")
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["vec_id"], r["k"]): r["val"]
        for r in random_projection(emb, out_dim=16).collect()
    }
    S = np.array([[_sign(j, k) for k in range(16)] for j in range(12)])
    want = vecs @ S
    for (i, k), v in got.items():
        assert v == pytest.approx(want[i, k], abs=1e-9)


def test_random_projection_plan_is_local(spark):
    emb = spark.createDataFrame(
        [(0, [1.0] * 8)], "vec_id long, embedding array<double>"
    )
    plan = (
        random_projection(emb, out_dim=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_ann_recall_bounds(spark):
    from sfa_spark.queries_text import q_ann_recall

    rows = q_ann_recall(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["n_hit"] <= 3
        assert r["recall"] == pytest.approx(r["n_hit"] / 3, abs=1e-3)


def test_zscore_outliers_flags_only_extremes(spark):
    from sfa_spark.operators.temporal import zscore_outliers

    rows = [(i, "a", 1.0) for i in range(20)] + [
        (100, "a", 500.0),        # extreme
        (101, "b", 7.0),          # degenerate group (sd=0 after one row)
    ]
    ev = spark.createDataFrame(rows, "event_id long, g string, value double")
    out = zscore_outliers(ev, by="g", value="value", z=3.0).collect()
    assert [r["event_id"] for r in out] == [100]
    assert out[0]["zscore"] > 3


def test_semantic_dedup_keeps_one_per_neighborhood(spark):
    from sfa_spark.operators.dedup import semantic_dedup
    from sfa_spark.operators.similarity import kmeans_fit

    base = np.eye(4)
    # iters=0 centroids = vecs 0 and 1 (e0, e1); vecs 2 and 3 are
    # scalings of e0 → cluster 0, cosine 1.0 with vec 0 and each other;
    # vec 4 (e2) ties in distance to both centroids → smallest
    # centroid id wins (cluster 0) but is orthogonal to everything
    vecs = [
        base[0], base[1],
        base[0] * 1.1, base[0] * 1.05,
        base[2],
    ]
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_fit(emb, n_centroids=2, iters=0)
    out = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(emb, cents, tau=0.9).collect()
    }
    # min-id keep rule: vec 0 survives its neighborhood, 2 and 3 drop
    assert out == {0: 1, 1: 1, 2: 0, 3: 0, 4: 1}


def test_cdc_chunks_boundaries_shift_stable(spark):
    """The CDC property: inserting a token near the front changes only
    the chunks up to the first boundary after the edit — later chunk
    hashes are IDENTICAL (fixed-stride chunking would shift them all)."""
    from sfa_spark.operators.corpus import cdc_chunks

    rng = np.random.default_rng(5)
    words = [f"w{int(x)}" for x in rng.integers(0, 1000, size=400)]
    orig = " ".join(words)
    edited = " ".join(words[:3] + ["INSERTED"] + words[3:])
    docs = spark.createDataFrame(
        [(0, orig), (1, edited)], "doc_id long, text string"
    )
    out = cdc_chunks(docs, divisor=8).collect()
    h0 = {r["chunk_hash"] for r in out if r["doc_id"] == 0}
    h1 = {r["chunk_hash"] for r in out if r["doc_id"] == 1}
    shared = h0 & h1
    # everything after the first post-edit boundary must re-align
    assert len(shared) >= 0.8 * len(h0), (len(shared), len(h0), len(h1))
    # and chunk lengths hover around the divisor
    n = [r["n_toks"] for r in out]
    assert 4 <= sum(n) / len(n) <= 16
