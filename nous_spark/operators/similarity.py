"""Similarity search over embedding columns (array<float>).

Two paths, per the scale playbook:
  * brute-force cosine — exact; JVM-side `aggregate`/`zip_with` math
    (whole-stage codegen, no Python) OR a numpy pandas-UDF when the query
    set is a matrix. Fine up to ~10^7 x dim per executor scan.
  * LSH-bucketed (random hyperplanes) — approximate; each vector maps to
    a signed-projection bit bucket, queries probe matching buckets only.
    The bucket map is the IVF-style scale path: the scan becomes a
    partition-pruned equi-join instead of a full sweep.

Mirrors the reference's Qdrant top-k (qdrant_repository.py:215-224,
limit=top_k, score_threshold) including the min-score filter, plus the
RAG verification semi-join analog in rag.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cosine_scores(
    vectors: DataFrame,
    query: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, score) — exact cosine vs one query vector, JVM-side math.

    All arithmetic in double (matches the DuckDB oracle's
    list_cosine_similarity on ::DOUBLE[] lists).
    """
    q = [float(x) for x in query]
    qnorm = float(np.sqrt(sum(x * x for x in q)))
    qcol = F.array(*[F.lit(x) for x in q])
    v = F.col(vec_col).cast("array<double>")
    dot = F.aggregate(
        F.zip_with(v, qcol, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    vnorm = F.sqrt(
        F.aggregate(F.transform(v, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x)
    )
    return vectors.select(
        F.col(id_col),
        (dot / (vnorm * F.lit(qnorm))).alias("score"),
    )


def cosine_topk(
    vectors: DataFrame,
    query: list[float],
    k: int = 10,
    min_score: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by cosine score (desc), deterministic tiebreak on id —
    the E1 operator (Qdrant query_points semantics).

    Selection uses orderBy+limit (Spark's distributed TakeOrdered: each
    partition keeps its local top-k, the driver merges k*parts rows) —
    NOT a global row_number window, which would shuffle every scored row
    into one task. The rank window then runs over only k rows.
    """
    scored = cosine_scores(vectors, query, id_col, vec_col)
    if min_score is not None:
        scored = scored.filter(F.col("score") >= min_score)
    topk = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        id_col, "score", "rank"
    )


def batch_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Many-query ANN baseline: numpy matmul per Arrow batch against a
    broadcast query matrix, then per-query window top-k.

    The query set is collected once and broadcast (it is the small side —
    same contract as F.broadcast on a dim table).

    Two-phase (same trick as curation.top_k_per_group): each Arrow batch
    keeps only its k best rows per query — under the IDENTICAL
    (score desc, id asc) total order the final window uses, so the
    global top-k per query is provably contained in the union of
    per-batch top-ks (any global winner beats its batch-mates too, ties
    included). The shuffle into the window carries ~n_batches*k rows per
    query instead of the full n_vectors x n_queries cross product.
    """
    qrows = queries.select(q_id_col, q_vec_col).collect()
    q_ids = [r[q_id_col] for r in qrows]
    qm = np.array([r[q_vec_col] for r in qrows], dtype=np.float64)
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    sc = vectors.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, qn))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, qmat = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            vm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vn = vm / np.maximum(np.linalg.norm(vm, axis=1, keepdims=True), 1e-12)
            scores = vn @ qmat.T  # (batch, n_queries)
            n_b, n_q = scores.shape
            vec_ids = pdf[id_col].to_numpy()
            if n_b <= k:  # nothing to prune
                yield pd.DataFrame(
                    {
                        q_id_col: np.repeat(ids, n_b),
                        id_col: np.tile(vec_ids, n_q),
                        "score": scores.T.ravel(),
                    }
                )
                continue
            # partial top-k per query under the window's exact total
            # order: lexsort keys are (secondary=-score, primary=id) —
            # np.lexsort sorts by the LAST key first, so ties on score
            # fall back to ascending id, matching row_number()'s
            # (desc(score), asc(id)) ordering tie-for-tie
            sel = [np.lexsort((vec_ids, -scores[:, j]))[:k] for j in range(n_q)]
            yield pd.DataFrame(
                {
                    q_id_col: np.repeat(ids, k),
                    id_col: np.concatenate([vec_ids[s] for s in sel]),
                    "score": np.concatenate(
                        [scores[s, j] for j, s in enumerate(sel)]
                    ),
                }
            )

    scored = vectors.select(id_col, vec_col).mapInPandas(
        gen, f"{q_id_col} long, {id_col} long, score double"
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "score", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the centroid-partitioned scale path
# ---------------------------------------------------------------------------
def ivf_train_centroids(
    vectors: DataFrame,
    n_lists: int = 16,
    sample_size: int = 10_000,
    n_iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train IVF coarse centroids on a DETERMINISTIC hash-sample.

    Standard IVF practice: centroids come from a small training sample,
    not the full corpus. The sample is selected by xxhash64(id) order —
    a pure function of the ids, so retraining on the same table yields
    identical centroids regardless of partitioning/parallelism (the
    resumability contract; pyspark.ml KMeans does not guarantee this —
    its float aggregation order follows partitioning). Lloyd iterations
    run driver-side in numpy on the sample (spherical k-means: vectors
    L2-normalized, cosine assignment).
    """
    sample = (
        vectors.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .limit(sample_size)
        .collect()
    )
    if not sample:
        raise ValueError("ivf_train_centroids: no vectors to train on")
    x = np.array([r[vec_col] for r in sample], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)].copy()
    for _ in range(n_iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return cents


def ivf_centroids_md5(
    vectors: DataFrame,
    n_lists: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Oracle-replicable IVF coarse centroids: the ``n_lists`` corpus
    vectors with the smallest cross-engine md5 draw (the
    curation.hash_uniform_col recipe), in (draw, id) order,
    L2-normalized.

    No Lloyd refinement — the selection is a pure function of the ids,
    so DuckDB replicates it EXACTLY (``ORDER BY md5-draw, id LIMIT n``),
    which is what lets ann_ivf_topk carry a full value-hash oracle.
    The Lloyd-trained path (ivf_train_centroids) remains the production
    default — its float iteration order is engine-specific, so it can
    only be rows/pytest-gated, never hash-matched cross-engine. With
    nprobe == n_lists both variants degenerate to the same exact scan.
    """
    from nous_spark.operators.curation import hash_uniform_col

    rows = (
        vectors.select(id_col, vec_col)
        .orderBy(hash_uniform_col(F.col(id_col), seed), F.col(id_col))
        .limit(n_lists)
        .collect()
    )
    if not rows:
        raise ValueError("ivf_centroids_md5: no vectors to pick from")
    x = np.array([r[vec_col] for r in rows], dtype=np.float64)
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def ivf_assign(
    vectors: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, list_id) — nearest-centroid assignment, numpy matmul per
    Arrow batch against broadcast centroids. At scale this column becomes
    the table's partition key, so probes prune whole partitions."""
    sc = vectors.sparkSession.sparkContext
    bc = sc.broadcast(centroids)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            vm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vm /= np.maximum(np.linalg.norm(vm, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "list_id": (vm @ cents.T).argmax(axis=1)}
            )

    return vectors.select(id_col, vec_col).mapInPandas(
        gen, f"{id_col} long, list_id int"
    )


def ivf_ann_topk(
    vectors: DataFrame,
    assignments: DataFrame,
    centroids: np.ndarray,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: rank centroids by cosine to the query, scan only the
    ``nprobe`` nearest inverted lists, exact cosine within them.

    nprobe == n_lists degenerates to exact brute force (tested); smaller
    nprobe trades recall for a 1/nprobe-ish scan fraction.
    """
    q = np.array(query, dtype=np.float64)
    q /= max(np.linalg.norm(q), 1e-12)
    # kind='stable' so exact similarity ties keep ascending list_id —
    # the same tiebreak the generated DuckDB oracle's ORDER BY uses.
    order = np.argsort(-(centroids @ q), kind="stable")[:nprobe]
    probe = [int(c) for c in order]
    cand_ids = assignments.filter(F.col("list_id").isin(probe)).select(id_col)
    cands = vectors.join(cand_ids, id_col, "left_semi")
    return cosine_topk(cands, query, k, None, id_col, vec_col)


def hyperplane_planes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    """The seeded random hyperplanes, (n_planes, dim) float64.

    Single source of truth for plane generation: hyperplane_buckets,
    lsh_ann_topk, AND the generated DuckDB oracle for emb_near_dup_lsh
    (which embeds these exact values as SQL literals) all call this —
    the oracle can never drift from the operator.
    """
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def hyperplane_buckets(
    vectors: DataFrame,
    n_planes: int = 12,
    dim: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector — the ANN scale path.

    bucket = sign-bit string of n_planes fixed (seeded) projections.
    Cosine-similar vectors collide with probability (1 - theta/pi)^n.
    """
    if dim is None:
        first = vectors.select(F.size(vec_col).alias("d")).first()
        if first is None:  # empty input -> empty buckets, not a crash
            # schema derived from the input (id_col may be string/int/...)
            empty_schema = T.StructType(
                [
                    T.StructField(id_col, vectors.schema[id_col].dataType),
                    T.StructField("bucket", T.LongType()),
                ]
            )
            return vectors.sparkSession.createDataFrame([], empty_schema)
        dim = int(first["d"])
    planes = hyperplane_planes(n_planes, dim, seed)
    sc = vectors.sparkSession.sparkContext
    bp = sc.broadcast(planes)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = bp.value
        for pdf in batches:
            if pdf.empty:
                continue
            vm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            bits = (vm @ pl.T) > 0  # (batch, planes)
            buckets = (bits * (1 << np.arange(pl.shape[0]))).sum(axis=1).astype(np.int64)
            yield pd.DataFrame({id_col: pdf[id_col], "bucket": buckets})

    # output schema derives the id type from the input (string ids are
    # legal); hardcoding `long` breaks Arrow conversion for string ids
    out_schema = T.StructType(
        [
            T.StructField(id_col, vectors.schema[id_col].dataType),
            T.StructField("bucket", T.LongType()),
        ]
    )
    return vectors.select(id_col, vec_col).mapInPandas(gen, out_schema)


def hyperplane_buckets_multi(
    vectors: DataFrame,
    n_planes: int,
    n_tables: int,
    dim: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, tbl, bucket) rows for ``n_tables`` independent seeded plane
    sets in ONE Arrow pass: the per-table plane matrices (seed +
    7919*t — identical values to per-table hyperplane_buckets calls and
    to the generated DuckDB oracle) are stacked into a single
    (n_tables*n_planes, dim) matrix, so the batch does one matmul and
    one Python-worker pass instead of n_tables of each. At corpus scale
    that is n_tables-fold fewer Arrow round trips over the data — the
    difference between 1 and 8 full scans."""
    if dim is None:
        first = vectors.select(F.size(vec_col).alias("d")).first()
        if first is None:
            empty_schema = T.StructType(
                [
                    T.StructField(id_col, vectors.schema[id_col].dataType),
                    T.StructField("tbl", T.IntegerType()),
                    T.StructField("bucket", T.LongType()),
                ]
            )
            return vectors.sparkSession.createDataFrame([], empty_schema)
        dim = int(first["d"])
    planes = np.vstack(
        [hyperplane_planes(n_planes, dim, seed + 7919 * t) for t in range(n_tables)]
    )
    sc = vectors.sparkSession.sparkContext
    bp = sc.broadcast(planes)
    weights = 1 << np.arange(n_planes)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = bp.value
        for pdf in batches:
            if pdf.empty:
                continue
            vm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            bits = (vm @ pl.T) > 0  # (batch, n_tables*n_planes)
            per_tbl = [
                (bits[:, t * n_planes : (t + 1) * n_planes] * weights)
                .sum(axis=1)
                .astype(np.int64)
                for t in range(n_tables)
            ]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: np.tile(pdf[id_col].to_numpy(), n_tables),
                    "tbl": np.repeat(np.arange(n_tables, dtype=np.int32), n),
                    "bucket": np.concatenate(per_tbl),
                }
            )

    out_schema = T.StructType(
        [
            T.StructField(id_col, vectors.schema[id_col].dataType),
            T.StructField("tbl", T.IntegerType()),
            T.StructField("bucket", T.LongType()),
        ]
    )
    return vectors.select(id_col, vec_col).mapInPandas(gen, out_schema)


def lsh_ann_topk(
    vectors: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k over hyperplane buckets, with MULTIPROBE.

    ``n_probes`` = number of buckets inspected. Probe order follows the
    standard multiprobe heuristic: the query's own bucket first, then
    buckets reached by flipping the LOWEST-MARGIN sign bits (smallest
    |q·plane| — the planes the query is closest to, hence the buckets
    its near neighbors most likely fell into), single flips before
    double flips. Raises recall without re-banding or extra tables; the
    scan stays a bucket-pruned semi-join of ~n_probes/2^n_planes of the
    corpus.
    """
    buckets = hyperplane_buckets(vectors, n_planes, len(query), seed, id_col, vec_col)
    planes = hyperplane_planes(n_planes, len(query), seed)
    proj = planes @ np.array(query, dtype=np.float64)
    qbucket = int(((proj > 0) * (1 << np.arange(n_planes))).sum())
    # candidate flip masks ranked by total margin flipped (Lv et al.'s
    # multiprobe ordering, restricted to flips of up to 3 bits — enough
    # to reach any bucket a near neighbor plausibly landed in at n<=16)
    # kind='stable' so exact |margin| ties keep ascending plane index —
    # the same tiebreak the generated DuckDB oracle's ORDER BY uses.
    order = np.argsort(np.abs(proj), kind="stable")
    margins = [abs(proj[order[i]]) for i in range(n_planes)]
    bits = [1 << int(order[i]) for i in range(n_planes)]
    masks: list[tuple[float, int]] = []
    for i in range(n_planes):
        masks.append((margins[i], bits[i]))
        for j in range(i + 1, n_planes):
            masks.append((margins[i] + margins[j], bits[i] | bits[j]))
            for l in range(j + 1, n_planes):
                masks.append(
                    (margins[i] + margins[j] + margins[l], bits[i] | bits[j] | bits[l])
                )
    masks.sort(key=lambda t: (t[0], t[1]))
    probe = [qbucket] + [qbucket ^ m for _, m in masks[: max(0, n_probes - 1)]]
    cand_ids = buckets.filter(F.col("bucket").isin(probe)).select(id_col)
    cands = vectors.join(cand_ids, id_col, "left_semi")
    return cosine_topk(cands, query, k, None, id_col, vec_col)


def cluster_balanced_sample(
    vectors: DataFrame,
    centroids: np.ndarray,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_shards: int = 8,
) -> DataFrame:
    """SemDeDup-flavor cluster-balanced coreset sampling: assign every
    vector to its nearest coarse centroid (ivf_assign — Arrow matmul
    against broadcast centroids), then keep each cluster's ``k`` most
    central vectors by (cosine-to-centroid desc, id asc). The standard
    diversity-preserving downsample of an embedding corpus: every
    cluster keeps representation, dominated regions don't flood the
    sample. Returns (list_id, id, score, rank), rank 1..k per cluster.

    Ranking uses the ROUNDED score as the shared sort key (the
    tfidf_topk ulp-proof trick) so the k-cutoff is cross-engine exact;
    with md5-picked centroids (ivf_centroids_md5) the whole operator is
    value-hash oracle-checkable. The per-cluster pick runs through
    curation.top_k_per_group's two-phase sharded windows — no
    cluster-sized window partition even when one centroid captures half
    the corpus.
    """
    from nous_spark.operators.curation import top_k_per_group

    assign = ivf_assign(vectors, centroids, id_col, vec_col)
    cents = vectors.sparkSession.createDataFrame(
        [(i, [float(x) for x in centroids[i]]) for i in range(len(centroids))],
        "list_id int, c array<double>",
    )
    v = F.col(vec_col).cast("array<double>")
    dot = F.aggregate(
        F.zip_with(v, F.col("c"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vnorm = F.sqrt(
        F.aggregate(F.transform(v, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x)
    )
    cnorm = F.sqrt(
        F.aggregate(
            F.transform(F.col("c"), lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    scored = (
        vectors.join(assign, id_col)
        .join(F.broadcast(cents), "list_id")
        .select(
            "list_id",
            F.col(id_col),
            F.round(dot / (vnorm * cnorm), 4).alias("score"),
        )
    )
    return top_k_per_group(
        scored, k, group_col="list_id", order_col="score",
        id_col=id_col, n_shards=n_shards,
    )
