"""Vector-operator ground truth vs numpy + ANN recall bounds."""

from __future__ import annotations

import numpy as np
import pytest

from dateng_data_lakes_apache_spark_spark.registry import get_queries

QS = get_queries()


@pytest.fixture(scope="module")
def np_embeddings(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vec_ids = np.array(t["vec_id"].to_pylist())
    mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return vec_ids, mat


def test_vector_norm_matches_numpy(spark, sf_dir, np_embeddings):
    vec_ids, mat = np_embeddings
    expected = {int(v): float(np.linalg.norm(m)) for v, m in zip(vec_ids, mat)}
    rows = QS["q_vector_norm"](spark, sf_dir).collect()
    for r in rows:
        assert abs(r.l2_norm - round(expected[r.vec_id], 4)) < 1e-9


def test_similarity_topk_matches_numpy(spark, sf_dir, np_embeddings):
    vec_ids, mat = np_embeddings
    q = mat[vec_ids == 0][0]
    cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(
        [(round(c, 4), int(v)) for v, c in zip(vec_ids, cos) if v != 0],
        key=lambda t: (-t[0], t[1]),
    )[:10]
    expected_ids = [v for _, v in order]
    got = [r.vec_id for r in QS["q_similarity_topk"](spark, sf_dir).collect()]
    assert got == expected_ids


def test_ann_lsh_recall_vs_bruteforce(spark, sf_dir):
    brute = {r.vec_id for r in QS["q_similarity_topk"](spark, sf_dir).collect()}
    lsh = {r.vec_id for r in QS["q_ann_lsh"](spark, sf_dir).collect()}
    # 8 tables × 4 planes: expected recall ≈0.8 for cosine≈0.5 neighbors;
    # require ≥40% overlap with the exact top-10 as a robust lower bound
    assert len(lsh & brute) >= 4


def test_ann_ivf_candidates_are_near(spark, sf_dir):
    rows = QS["q_ann_ivf"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 10
    brute = {r.vec_id: r.cosine for r in QS["q_similarity_topk"](spark, sf_dir).collect()}
    # every IVF result that the exact search also ranked must agree on score
    for r in rows:
        if r.vec_id in brute:
            assert abs(r.cosine - brute[r.vec_id]) < 1e-9


def test_dedup_embedding_matches_numpy(spark, sf_dir, np_embeddings):
    import pyarrow.parquet as pq

    vec_ids, mat = np_embeddings
    labels = np.array(
        pq.read_table(f"{sf_dir}/embeddings.parquet")["label"].to_pylist()
    )
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = normed @ normed.T
    expected = set()
    for i in range(len(vec_ids)):
        for j in range(len(vec_ids)):
            if (
                labels[i] == labels[j]
                and vec_ids[i] < vec_ids[j]
                and cos[i, j] >= 0.35
            ):
                expected.add((int(vec_ids[i]), int(vec_ids[j])))
    got = {
        (r.vec_a, r.vec_b)
        for r in QS["q_dedup_embedding"](spark, sf_dir).collect()
    }
    assert got == expected


def test_dedup_embedding_lsh_recall(spark, sf_dir, np_embeddings):
    vec_ids, mat = np_embeddings
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = normed @ normed.T
    iu = np.triu_indices(len(vec_ids), k=1)
    hits = [
        (int(min(vec_ids[i], vec_ids[j])), int(max(vec_ids[i], vec_ids[j])))
        for i, j in zip(*iu)
        if cos[i, j] >= 0.35
    ]
    got = {
        (r.vec_a, r.vec_b)
        for r in QS["q_dedup_embedding_lsh"](spark, sf_dir).collect()
    }
    # no false positives: every reported pair is a true >=0.35 pair
    assert got <= set(hits)
    # recall: 8-table/4-plane LSH should recover well over half the
    # true pairs at these (modest) similarity levels
    assert len(got) >= len(hits) * 0.5


def test_approx_count_distinct_error_bound(spark, sf_dir):
    from dateng_data_lakes_apache_spark_spark.catalog import table

    exact_cust = table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    row = QS["q_agg_approx_distinct"](spark, sf_dir).collect()[0]
    assert abs(row.approx_custkeys - exact_cust) / exact_cust < 0.06  # 3×rsd


def test_knn_graph_shape_and_recall(spark, sf_dir, np_embeddings):
    vec_ids, mat = np_embeddings
    rows = QS["q_knn_graph"](spark, sf_dir).collect()
    by_src: dict[int, list] = {}
    for r in rows:
        assert r.vec_a != r.vec_b
        by_src.setdefault(r.vec_a, []).append(r)
    # ≤ k edges per source, ranks contiguous from 1, scores non-increasing
    for src, edges in by_src.items():
        edges.sort(key=lambda r: r.rank)
        assert [e.rank for e in edges] == list(range(1, len(edges) + 1))
        assert all(edges[i].cosine >= edges[i + 1].cosine for i in range(len(edges) - 1))
    # recall vs the exact top-5 graph, averaged over a deterministic sample
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = normed @ normed.T
    idx_of = {int(v): i for i, v in enumerate(vec_ids)}
    sample = sorted(by_src)[:50]
    recalls = []
    for src in sample:
        i = idx_of[src]
        order = [j for j in np.argsort(-cos[i]) if j != i]
        exact_top5 = {int(vec_ids[j]) for j in order[:5]}
        got = {e.vec_b for e in by_src[src]}
        recalls.append(len(got & exact_top5) / 5)
    # multi-table LSH: per-node recall fluctuates, the mean must clear 0.4
    assert sum(recalls) / len(recalls) >= 0.4


def test_ann_pq_recall_vs_exact(spark, sf_dir):
    """PQ codes are a 128x compression; ADC top-10 must still recover a
    majority of the exact cosine top-10 (recall@10 >= 0.5), with
    non-negative reconstructed distances."""
    approx = QS["q_ann_pq"](spark, sf_dir).collect()
    assert len(approx) == 10
    assert all(r.approx_d2 >= 0 for r in approx)
    brute = {r.vec_id for r in QS["q_similarity_topk"](spark, sf_dir).collect()}
    got = {r.vec_id for r in approx}
    assert len(got & brute) >= 5, f"recall@10 {len(got & brute)}/10"


def test_embedding_covariance_matches_numpy(spark):
    """Spark's decimal-accumulated covariance equals numpy's exact
    computation to well inside the 6-dp rounding grid."""
    import numpy as np

    from .conftest import SF_SMALL

    from dateng_data_lakes_apache_spark_spark.registry import get_queries

    rows = get_queries()["q_embedding_covariance"](spark, SF_SMALL).collect()
    embs = np.array(
        [
            r["embedding"][:8]
            for r in spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
        ],
        dtype="float64",
    )
    ref = np.cov(embs, rowvar=False, ddof=1)
    for r in rows:
        assert abs(r["cov"] - ref[r["i"] - 1, r["j"] - 1]) < 5e-6
