"""IVF ANN tests: deterministic centroid training, exactness at full
probe, recall on clustered data at partial probe."""

from __future__ import annotations

import numpy as np
import pytest

from nous_spark.operators.similarity import (
    cosine_topk,
    ivf_ann_topk,
    ivf_assign,
    ivf_train_centroids,
)

DIM = 16
N_CLUSTERS = 8
PER_CLUSTER = 40


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.RandomState(3)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, vid = [], 0
    for c in range(N_CLUSTERS):
        for _ in range(PER_CLUSTER):
            v = centers[c] + 0.15 * rng.standard_normal(DIM)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    return df, centers


def test_centroids_deterministic_across_partitioning(clustered):
    df, _ = clustered
    c1 = ivf_train_centroids(df.repartition(2), n_lists=N_CLUSTERS)
    c2 = ivf_train_centroids(df.repartition(7), n_lists=N_CLUSTERS)
    assert np.array_equal(c1, c2)


def test_full_probe_equals_brute_force(clustered):
    df, centers = clustered
    cents = ivf_train_centroids(df, n_lists=N_CLUSTERS)
    assign = ivf_assign(df, cents).cache()
    q = [float(x) for x in centers[0]]
    exact = [r["vec_id"] for r in cosine_topk(df, q, k=10).collect()]
    full = [
        r["vec_id"]
        for r in ivf_ann_topk(df, assign, cents, q, k=10, nprobe=N_CLUSTERS).collect()
    ]
    assert full == exact


def test_partial_probe_recall(clustered):
    df, centers = clustered
    cents = ivf_train_centroids(df, n_lists=N_CLUSTERS)
    assign = ivf_assign(df, cents).cache()
    # lists are balanced-ish: every cluster has one dominant inverted list
    sizes = {r["list_id"]: r["n"] for r in assign.groupBy("list_id").count().withColumnRenamed("count", "n").collect()}
    assert len(sizes) == N_CLUSTERS
    hits = 0
    for c in range(N_CLUSTERS):
        q = [float(x) for x in centers[c]]
        exact = {r["vec_id"] for r in cosine_topk(df, q, k=10).collect()}
        approx = {
            r["vec_id"]
            for r in ivf_ann_topk(df, assign, cents, q, k=10, nprobe=2).collect()
        }
        hits += len(exact & approx)
    recall = hits / (10 * N_CLUSTERS)
    assert recall >= 0.9, recall


def test_lsh_multiprobe_recall_improves(spark):
    """Multiprobe inspects the lowest-margin flip buckets: recall@k vs
    exact must be non-decreasing in n_probes, and generous probing must
    recover most of the exact top-k (single-probe typically cannot)."""
    import numpy as np

    from nous_spark.operators.similarity import cosine_topk, lsh_ann_topk

    rng = np.random.RandomState(5)
    base = rng.standard_normal(32)
    base /= np.linalg.norm(base)
    rows = []
    for i in range(200):
        if i < 30:  # planted near neighbors (cosine ~0.92 to the query)
            v = base + 0.08 * rng.standard_normal(32)
        else:
            v = rng.standard_normal(32)
        rows.append((i, [float(x) for x in v]))
    vectors = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    query = [float(x) for x in base]

    exact = {r["vec_id"] for r in cosine_topk(vectors, query, k=10).collect()}
    recalls = []
    for probes in (1, 8, 32):
        got = {
            r["vec_id"]
            for r in lsh_ann_topk(
                vectors, query, k=10, n_planes=8, n_probes=probes
            ).collect()
        }
        recalls.append(len(got & exact) / len(exact))
    assert recalls[0] <= recalls[1] <= recalls[2]
    assert recalls[2] >= 0.9


def test_cluster_balanced_sample_semantics(spark):
    import os

    sf_dir = os.environ.get("NOUS_TEST_SF_DIR", "/root/testdata/sf0.001")
    from nous_spark.operators.similarity import (
        cluster_balanced_sample,
        ivf_assign,
        ivf_centroids_md5,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_centroids_md5(emb, n_lists=8, seed=42)
    out = cluster_balanced_sample(emb, cents, k=5).collect()
    sizes = {
        r["list_id"]: r["n"]
        for r in ivf_assign(emb, cents).groupBy("list_id").count()
        .withColumnRenamed("count", "n").collect()
    }
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["list_id"], []).append(r)
    for lid, rows in by_cluster.items():
        # exactly min(k, cluster size) picks, ranks contiguous from 1
        assert len(rows) == min(5, sizes[lid])
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
        # most-central first: scores non-increasing in rank order
        ordered = [r["score"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert ordered == sorted(ordered, reverse=True)
    # a sampled vector belongs to the cluster it was assigned to
    assign = {r["vec_id"]: r["list_id"] for r in ivf_assign(emb, cents).collect()}
    assert all(assign[r["vec_id"]] == r["list_id"] for r in out)


def test_batch_cosine_topk_partial_prune_exact_on_ties(spark):
    """The per-batch partial top-k must be invisible: with exact score
    ties spanning multiple partitions (duplicate vectors, k smaller than
    the tie group), the result equals the brute-force (score desc, id
    asc) ranking row for row."""
    from nous_spark.operators.similarity import batch_cosine_topk

    rng = np.random.RandomState(7)
    base = rng.standard_normal((4, DIM))
    rows = []
    for vid in range(64):
        # four exact-duplicate directions, interleaved by id so every
        # partition holds members of every tie group
        v = base[vid % 4] * (1.0 + (vid % 4))  # scaled copies: same cosine
        rows.append((vid, [float(x) for x in v]))
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(8)
    queries = spark.createDataFrame(
        [(j, [float(x) for x in base[j]]) for j in range(4)],
        "q_id long, q_vec array<double>",
    )
    k = 5
    got = sorted(
        (r["q_id"], r["rank"], r["vec_id"], round(r["score"], 9))
        for r in batch_cosine_topk(vecs, queries, k=k).collect()
    )
    # brute-force reference in the same float64 math
    vm = np.array([v for _, v in rows])
    vm /= np.linalg.norm(vm, axis=1, keepdims=True)
    qm = base / np.linalg.norm(base, axis=1, keepdims=True)
    want = []
    for j in range(4):
        s = vm @ qm[j]
        order = np.lexsort((np.arange(64), -s))[:k]
        want.extend(
            (j, rank + 1, int(vid), round(float(s[vid]), 9))
            for rank, vid in enumerate(order)
        )
    assert got == sorted(want)
    # the 16 exact duplicates of each direction tie at score 1.0 — the
    # k winners must be the smallest ids of the tie group (0,4,8,...)
    top_ids = {q: [] for q in range(4)}
    for q, rank, vid, score in got:
        top_ids[q].append(vid)
    assert top_ids[0] == [0, 4, 8, 12, 16]
