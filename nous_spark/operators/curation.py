"""Training-corpus curation operators: deterministic stratified sampling
and budget-quantized sequence packing.

Both are the pre-tokenization steps a 100 TB pretraining pipeline runs
after dedup/quality filtering: sampling rebalances the language/domain
mix, packing groups documents into fixed-token-budget training
sequences. Both are pure Column/window expressions (JVM, codegen, no
Python workers) and fully oracle-checkable — the sampling decision is a
cross-engine md5 hash (the doc_fingerprints recipe), not Spark's
``sample()`` (whose Bernoulli draw is partition-dependent and therefore
not reproducible across engines or re-partitioning).

Scale notes:
  * sampling is a stateless map — no shuffle, pushes down past nothing
    it needs to;
  * packing is one window per (``group_col``, shard) partition: the
    sort is the unavoidable cost of sequential packing; ``n_shards``
    salts the hot group (e.g. 'en' at ~half the corpus) into
    deterministic md5 shards so no single window partition exceeds a
    task — the hot-key cap every blocking operator in this repo takes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nous_spark.operators.text import lang_id_col, token_count_col


def hash_uniform_col(key: Column, seed: int = 42) -> Column:
    """Deterministic uniform draw in [0, 1): the first 8 md5 hex chars
    of "key:seed" scaled by 2^32 — computable identically in DuckDB as
    ``('0x' || substr(md5(key || ':seed'), 1, 8))::BIGINT /
    4294967296.0``. Every value is an exact multiple of 2^-32, so
    threshold comparisons are float-exact across engines."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(":", key.cast("string"), F.lit(str(seed))).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return h / F.lit(float(1 << 32))


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row with probability ``fractions[stratum]`` (else
    ``default_fraction``), decided by the deterministic per-row hash —
    reproducible across runs, engines, and repartitioning, unlike
    ``DataFrame.sample``. Returns the surviving rows unchanged."""
    frac = F.lit(float(default_fraction))
    for k in sorted(fractions):  # deterministic plan for a stable oracle
        frac = F.when(F.col(stratum_col) == k, F.lit(float(fractions[k]))).otherwise(
            frac
        )
    return docs.filter(hash_uniform_col(F.col(id_col), seed) < frac)


def quality_weighted_sample(
    docs: DataFrame,
    score_col: str = "quality_score",
    alpha: float = 9.0,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """GPT-3-style Pareto quality sampling (Brown et al. 2020, App. A):
    keep a document iff a Pareto(alpha) draw exceeds ``1 - score`` — so
    high-scoring docs are kept almost surely, low-scoring docs survive
    with small probability (keeping SOME low-quality text avoids the
    classifier's blind spots becoming the corpus's). The stochastic rule
    is inverted into a deterministic one: with u the per-row md5 uniform
    draw, Pareto(alpha) = (1-u)^(-1/alpha) - 1 > 1 - score is exactly

        u > 1 - (2 - score)^(-alpha)

    The threshold is rounded to 6 decimals on BOTH engines so a 1-ulp
    pow() difference can never flip a keep decision against the oracle
    (the repo's round-then-compare convention); u itself is an exact
    multiple of 2^-32. Returns surviving rows unchanged. score_col is
    any [0,1] quality column — text.quality_classifier_score's output,
    or a heuristic blend.

    Scale: a stateless per-row filter (zero exchanges), pushed into the
    scan whenever score_col is a stored column.
    """
    threshold = F.round(
        F.lit(1.0) - F.pow(F.lit(2.0) - F.col(score_col), F.lit(-float(alpha))), 6
    )
    return docs.filter(hash_uniform_col(F.col(id_col), seed) > threshold)


def hash_shard_col(key: Column, n_shards: int, seed: int = 42) -> Column:
    """Deterministic shard in [0, n_shards): the 32-bit md5 draw of
    ``hash_uniform_col`` taken mod n_shards — same cross-engine recipe
    (DuckDB: ``('0x' || substr(md5(key || ':seed'), 1, 8))::BIGINT %
    n``), non-negative on both sides because the hash is."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(":", key.cast("string"), F.lit(str(seed))).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(n_shards))


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 2048,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences:
    within each (``group_col``, shard) partition, in ``id_col`` order,
    document d lands in sequence floor(preceding-token-sum / budget).
    Documents are never split; a sequence may overflow by at most its
    last document (budget-QUANTIZED packing — the deterministic,
    single-window-pass discipline; true first-fit bin packing is
    order-dependent and doesn't parallelize). Returns
    (id, group, n_tokens, seq_id).

    ``n_shards`` is the hot-key cap this operator owes the rest of the
    repo (CLAUDE.md invariant): a bare ``partitionBy(lang)`` makes the
    'en' window a single-task sort of ~half the corpus at web scale.
    With n_shards > 1 each document is salted into a deterministic md5
    shard (cross-engine, like the sampling draw) and the window runs
    per (group, shard); shard-local sequence ids are namespaced as
    ``local_seq * n_shards + shard`` — collision-free, deterministic,
    and independent of physical partitioning. n_shards=1 (default)
    preserves the globally-contiguous-per-group ids. Size n_shards so
    corpus_tokens / (n_groups * n_shards) fits one task's sort budget.
    """
    d = docs.select(
        id_col, group_col, token_count_col(F.col(text_col)).cast("long").alias("n_tokens")
    )
    return _pack_token_frame(d, budget_tokens, group_col, id_col, n_shards, seed)


def _pack_token_frame(
    d: DataFrame,
    budget_tokens: int,
    group_col: str,
    id_col: str,
    n_shards: int,
    seed: int,
) -> DataFrame:
    """pack_sequences over a prepared (id, group, n_tokens) frame —
    lets composed pipelines reuse one tokenized frame instead of
    re-counting."""
    from pyspark.sql import Window

    part: list = [group_col]
    if n_shards > 1:
        d = d.withColumn("_shard", hash_shard_col(F.col(id_col), n_shards, seed))
        part.append("_shard")
    w = (
        Window.partitionBy(*part)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    local = F.floor(prev / budget_tokens)
    seq = local * n_shards + F.col("_shard") if n_shards > 1 else local
    return d.withColumn("seq_id", seq).select(
        id_col, group_col, "n_tokens", "seq_id"
    )


def shuffle_to_shards(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic global shuffle + fixed shard layout — the last mile
    of a pretraining pipeline: every surviving document gets a
    reproducible pseudo-random training position, expressed as
    (shard, pos) with the total order (shard asc, pos asc). Unlike
    ``DataFrame.orderBy(rand())`` the layout is identical across runs,
    engines, and physical partitionings, so a resumed or re-run job
    feeds the trainer byte-identical batch order.

    Shard = the 32-bit md5 draw of ``hash_shard_col`` (id:seed);
    within-shard order = full md5 of "id:shuf:seed" (a SECOND,
    independent hash context — shard and order don't correlate), ties
    (md5 collisions) broken by id. ``pos`` is 1-based and contiguous
    per shard.

    Scale: the only wide ops are the hash-partitioned per-shard
    row_number windows over (id, 2×16-byte hash) rows — the payload is
    NOT carried through the sort; join text back on id at write time
    (one co-partitioned shuffle) or write shards directly with
    repartition(shard).sortWithinPartitions. n_shards is this
    operator's hot-key cap (CLAUDE.md invariant): size it so
    corpus_docs / n_shards fits one task's sort budget (~10M keys) —
    at 10^10 docs that's n_shards ≈ 1024, and shard sizes concentrate
    tightly around the mean (md5 is uniform)."""
    from pyspark.sql import Window

    key = F.col(id_col)
    sk = F.md5(
        F.concat_ws(":", key.cast("string"), F.lit("shuf"), F.lit(str(seed))).cast(
            "binary"
        )
    )
    d = docs.select(
        key.alias(id_col),
        hash_shard_col(key, n_shards, seed).alias("shard"),
        sk.alias("_sk"),
    )
    w = Window.partitionBy("shard").orderBy(F.asc("_sk"), F.asc(id_col))
    return d.withColumn("pos", F.row_number().over(w).cast("long")).select(
        id_col, "shard", "pos"
    )


def top_k_per_group(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    descending: bool = True,
    n_shards: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Per-group quota capping — the CommonCrawl-curation "keep at most
    k pages per domain" rule (and the generic best-k-by-quality pick).
    Returns (group, id, order, rank) for the top ``k`` rows of each
    group under the deterministic total order (``order_col``
    desc-or-asc, ``id_col`` asc tiebreak), rank 1-based.

    Two-phase so no window partition is ever group-sized (the hot-key
    cap this repo requires of every per-group operator): phase 1 ranks
    within (group, md5-shard-of-id) and keeps each shard's local top-k
    — any global top-k row is necessarily in its own shard's local
    top-k, so the ≤ k*n_shards survivors per group are a superset of
    the answer; phase 2 re-ranks the survivors per group, a window over
    at most k*n_shards rows no matter how hot the group. Exactly equals
    the single-window ``row_number() <= k`` result, at any sharding.
    """
    from pyspark.sql import Window

    ordering = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        F.col(id_col).asc(),
    ]
    d = df.select(group_col, id_col, order_col)
    if n_shards > 1:
        d = d.withColumn("_shard", hash_shard_col(F.col(id_col), n_shards, seed))
        w_local = Window.partitionBy(group_col, "_shard").orderBy(*ordering)
        d = (
            d.withColumn("_lrn", F.row_number().over(w_local))
            .filter(F.col("_lrn") <= k)
            .drop("_shard", "_lrn")
        )
    w = Window.partitionBy(group_col).orderBy(*ordering)
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, id_col, order_col, "rank")
    )


def token_budget_mix(
    docs: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    pinned_totals: dict[str, int] | None = None,
) -> DataFrame:
    """Domain/language mixture rebalancing to a token budget — the
    "sample each source so the training mix hits the target weights"
    step (the Pile / Gopher / LLaMA recipe): stratum s with target
    weight w_s gets keep-fraction min(1, budget*w_s / tokens_s), and
    rows are kept by the deterministic per-doc md5 draw (reproducible
    across runs/engines/partitioning). Expected sampled tokens per
    stratum = min(budget*w_s, tokens_s) — under-weight strata are kept
    whole (epoch-repeating is the trainer's job, not the sampler's).
    Strata absent from ``weights`` are dropped. Returns
    (id, stratum, n_tokens) for the surviving docs.

    Scale: one map-side-combinable aggregation for per-stratum totals
    (rows = |strata|, broadcast back), then a stateless filter — no
    repartitioning of the corpus, composes with any downstream op.
    The budget*w_s products are baked as literals so the only runtime
    float op is one double division, bit-identical in Spark and DuckDB.

    Streaming: pass ``pinned_totals`` ({stratum: corpus token total},
    e.g. from a prior batch profile) to replace the totals aggregation
    with baked literal fractions — the operator becomes a fully
    stateless Column map that runs per micro-batch on a readStream
    frame. SEMANTICS NOTE: pinned fractions are exact only against the
    pinned profile; if the live stream's per-stratum totals drift from
    it, realized mix weights drift proportionally (global-totals batch
    semantics would re-normalize). Stream == batch whenever both use
    the same totals (tested in test_streaming).
    """
    d = docs.filter(F.col(stratum_col).isin(sorted(weights))).select(
        F.col(id_col),
        F.col(stratum_col),
        token_count_col(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    return _mix_token_frame(
        d, weights, budget_tokens, stratum_col, id_col, seed, pinned_totals
    )


def _mix_token_frame(
    d: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    stratum_col: str,
    id_col: str,
    seed: int,
    pinned_totals: dict[str, int] | None = None,
) -> DataFrame:
    """token_budget_mix over a prepared (id, stratum, n_tokens) frame
    whose strata are already restricted to ``weights`` — lets composed
    pipelines reuse one tokenized frame instead of re-counting. With
    ``pinned_totals`` the keep-fractions are baked literals (no
    aggregation, no join — streamable)."""
    if pinned_totals is not None:
        fr = F.lit(None).cast("double")
        for k in sorted(weights):
            f_k = min(
                1.0, float(budget_tokens * weights[k]) / max(pinned_totals[k], 1)
            )
            fr = F.when(F.col(stratum_col) == k, F.lit(f_k)).otherwise(fr)
        return d.filter(hash_uniform_col(F.col(id_col), seed) < fr).select(
            id_col, stratum_col, "n_tokens"
        )
    totals = d.groupBy(stratum_col).agg(F.sum("n_tokens").alias("_tot"))
    # the callers' isin filter is what drops unweighted strata — a NULL
    # weight here would NOT: least() skips NULLs in both Spark and
    # DuckDB, silently turning "no weight" into fraction 1.0
    bw = F.lit(None).cast("double")
    for k in sorted(weights):
        bw = F.when(
            F.col(stratum_col) == k, F.lit(float(budget_tokens * weights[k]))
        ).otherwise(bw)
    frac = F.least(F.lit(1.0), bw / F.col("_tot"))
    return (
        d.join(F.broadcast(totals), stratum_col)
        .filter(hash_uniform_col(F.col(id_col), seed) < frac)
        .select(id_col, stratum_col, "n_tokens")
    )


def curation_pipeline(
    docs: DataFrame,
    weights: dict[str, float],
    mix_budget_tokens: int,
    seq_budget_tokens: int = 1024,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 4,
    seed: int = 42,
) -> DataFrame:
    """The end-to-end pre-tokenization curation chain, composed from
    this repo's operators exactly as a 100 TB corpus would run it:

      1. quality filter      (text.quality_score_cols keep flag)
      2. exact dedup         (min-id survivor per md5(text))
      3. mixture rebalancing (token_budget_mix)
      4. sequence packing    (pack_sequences, md5-sharded windows)

    Returns (id, stratum, n_tokens, seq_id) for the surviving docs —
    the table a tokenizer job consumes. Every stage is the library
    operator (no reimplementation), so the scale properties compose:
    stages 1-2 are a filter + one hash aggregation, stage 3 adds a
    broadcast-back totals row per stratum, stage 4 one bounded window
    per (stratum, shard). Deterministic end to end; the DuckDB oracle
    replicates the full chain as one CTE stack.
    """
    from nous_spark.operators.text import quality_score_cols

    kept = docs.filter(quality_score_cols(F.col(text_col))["keep"])
    survivors = kept.groupBy(F.md5(F.col(text_col)).alias("_h")).agg(
        F.min(id_col).alias(id_col)
    )
    deduped = kept.join(survivors.select(id_col), id_col, "semi")
    # ONE tokenized pass over the quality+dedup subtree, checkpointed
    # eagerly (the dedup-operator discipline): without this, the three
    # downstream branches (mix totals, mix filter, packing) would each
    # re-run the quality regexes + dedup aggregation + token count over
    # the full corpus. The frame is 3 narrow columns — cheap to pin.
    toks = deduped.filter(F.col(stratum_col).isin(sorted(weights))).select(
        F.col(id_col),
        F.col(stratum_col),
        token_count_col(F.col(text_col)).cast("long").alias("n_tokens"),
    ).localCheckpoint()
    sampled = _mix_token_frame(
        toks, weights, mix_budget_tokens, stratum_col, id_col, seed
    )
    return _pack_token_frame(
        sampled, seq_budget_tokens, stratum_col, id_col, n_shards, seed
    )


def quantile_buckets(
    df: DataFrame,
    score_col: str,
    quantiles: tuple[float, ...] = (0.1, 0.5),
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    group_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group quantile bucketing — the CCNet head/middle/tail split
    (Wenzek et al. 2020 §4.4: each language's corpus is cut at
    perplexity quantiles; 'head' trains first / survives hardest).
    Bucket i holds rows with score <= t_i where t_i is the smallest
    score whose inclusive cumulative count reaches ceil(q_i * n_group)
    — an EXACT order statistic, not an approximate percentile, so the
    DuckDB oracle reproduces it bit-for-bit. Ties at a threshold all
    fall into the lower bucket (inclusive <=), which can make 'head'
    hold more than q_0 of a group — the deterministic reading of the
    CCNet rule. Rows with NULL score are dropped (a doc the scorer
    could not score has no quantile); labels has one more entry than
    quantiles (ascending, in (0, 1)).

    Scale: the corpus never sorts. Rows collapse to a per-(group,
    score) count table first (map-side combine — pass a ROUNDED score
    column, e.g. corpus_lm_nll's avg_nll at 4 decimals, so the table
    is bounded like the repo's other per-value aggregations); the
    cumulative window runs over that bounded table (eagerly
    localCheckpointed — its three consumers must not re-derive the
    input, the multi-consumer ReusedExchange lesson), the |groups|-row
    threshold table broadcasts back, and bucketing is a stateless map.
    The hot group ('en' at half the corpus) costs one combinable
    aggregation, never a group-sized window partition. The INPUT is
    consumed twice (count-table build + final bucketing join) — if the
    score column is expensive to derive (a corpus-trained model score),
    persist/localCheckpoint the scored frame before calling, as the
    driver's doc_ccnet_buckets query does.
    """
    from pyspark.sql import Window

    if len(labels) != len(quantiles) + 1:
        raise ValueError("labels must have len(quantiles) + 1 entries")
    if list(quantiles) != sorted(quantiles) or not all(
        0.0 < q < 1.0 for q in quantiles
    ):
        raise ValueError("quantiles must be ascending and inside (0, 1)")

    gcol = group_col or "_qb_group"
    base = df.filter(F.col(score_col).isNotNull())
    if group_col is None:
        base = base.withColumn(gcol, F.lit("_all"))
    sc = (
        base.groupBy(gcol, score_col)
        .agg(F.count("*").alias("_cnt"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy(gcol).orderBy(score_col)
    cum = sc.withColumn("_cum", F.sum("_cnt").over(w))
    tot = sc.groupBy(gcol).agg(F.sum("_cnt").alias("_n"))
    thr = (
        cum.join(tot, gcol)
        .groupBy(gcol)
        .agg(
            *[
                F.min(
                    F.when(
                        F.col("_cum") >= F.ceil(F.lit(q) * F.col("_n")),
                        F.col(score_col),
                    )
                ).alias(f"_t{i}")
                for i, q in enumerate(quantiles)
            ]
        )
    )
    bucket = F.lit(labels[-1])
    for i in range(len(quantiles) - 1, -1, -1):
        bucket = F.when(F.col(score_col) <= F.col(f"_t{i}"), F.lit(labels[i])).otherwise(
            bucket
        )
    out_cols = [id_col] + ([group_col] if group_col else []) + [score_col]
    return (
        base.join(F.broadcast(thr), gcol)
        .withColumn("bucket", bucket)
        .select(*out_cols, "bucket")
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 24,
    stride: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-window token chunking — the example-preparation step that
    turns variable-length documents into bounded training/RAG chunks:
    window k covers whitespace tokens [1 + k*stride, 1 + k*stride +
    max_tokens) of the doc, so consecutive chunks overlap by
    ``max_tokens - stride`` tokens (stride == max_tokens gives an exact
    disjoint partition of the token list; stride < max_tokens gives the
    sliding-context overlap RAG retrievers want). One window starts at
    every 1 + k*stride <= n_tokens, so every token is covered and the
    final chunk may be short. Whitespace-only/NULL docs emit no chunks.

    Returns (id, chunk_id, n_tokens, chunk_text): chunk_id is the
    0-based window index k, n_tokens the actual token count of the
    (possibly short) final window, chunk_text the space-joined tokens
    (whitespace runs canonicalize to single spaces — ``token_count_col``'s
    tokenizer, hardened with a \\s-trim so tab/newline edges never yield
    empty tokens).

    Scale: stateless narrow projection + one posexplode — zero
    exchanges, streams, and the per-doc fan-out is bounded by
    n_tokens / stride (no hot key to cap: a pathological 10^9-token doc
    is a length-filter problem upstream, not a chunker problem).
    Mirrored exactly by the generated ``chunk_oracle_sql``.
    """
    if max_tokens < 1 or stride < 1:
        raise ValueError("max_tokens and stride must be >= 1")
    # \s-trim, not F.trim: trim() strips only 0x20, so a doc of "\n\t"
    # (or a leading tab) would survive the emptiness filter / emit a
    # spurious empty first token after the \s+ split.
    stripped = F.regexp_replace(
        F.coalesce(F.col(text_col), F.lit("")), r"^\s+|\s+$", ""
    )
    d = docs.filter(stripped != "").select(
        F.col(id_col), F.split(stripped, r"\s+").alias("_ws")
    )
    starts = F.sequence(F.lit(1), F.size("_ws"), F.lit(stride))
    d = d.select(id_col, "_ws", F.posexplode(starts).alias("_k", "_start"))
    return d.select(
        id_col,
        F.col("_k").cast("long").alias("chunk_id"),
        F.least(F.lit(max_tokens), F.size("_ws") - F.col("_start") + 1)
        .cast("long")
        .alias("n_tokens"),
        F.array_join(F.slice("_ws", F.col("_start"), max_tokens), " ").alias(
            "chunk_text"
        ),
    )


def chunk_oracle_sql(
    max_tokens: int = 24,
    stride: int = 16,
    source: str = "SELECT doc_id, text FROM documents",
) -> str:
    """DuckDB mirror of ``chunk_documents``, GENERATED from the same
    window parameters. ``range(1, len+1, stride)`` is exclusive-stop, so
    start positions match Spark's inclusive ``sequence(1, n, stride)``;
    ``//`` is DuckDB's integer division (bare ``/`` would be DOUBLE);
    list slicing is 1-based inclusive and clamps at the end like
    ``F.slice``; the \\s-regexp trim (not trim(), which strips only
    0x20) mirrors the Spark side exactly."""
    return f"""
        WITH stripped AS (
          SELECT doc_id,
                 regexp_replace(coalesce(text, ''), '^\\s+|\\s+$', '', 'g')
                   AS st
          FROM ({source})
        ),
        tok AS (
          SELECT doc_id, regexp_split_to_array(st, '\\s+') AS ws
          FROM stripped WHERE st != ''
        )
        SELECT doc_id,
               CAST((s - 1) // {stride} AS BIGINT) AS chunk_id,
               CAST(least({max_tokens}, len(ws) - s + 1) AS BIGINT) AS n_tokens,
               coalesce(array_to_string(ws[s:s + {max_tokens} - 1], ' '), '')
                 AS chunk_text
        FROM tok, UNNEST(range(1, len(ws) + 1, {stride})) AS t(s)
    """


def corpus_datacard(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus composition report ("data card", Dolma/Gopher style): one
    row per ``group_col`` value with the numbers every pretraining run
    publishes about its mixture — doc count, whitespace-token volume
    (``token_count_col``, the module's one token identity), token
    min/avg/max, the exact-duplicate mass (1 − distinct-text fraction,
    md5 identity with NULL ≡ '' like the dedup operators), and the
    dominant detected language (``lang_id_col``) with its share.
    Reference has no analog (builder-brief web-corpus extension).

    Determinism: the language mode tie-breaks (count DESC, lang ASC) —
    no arbitrary-row picks. All formulas are replayed verbatim by the
    generated DuckDB oracle in ``__spark_entry__._build_datacard_sql``.

    Scale: the per-doc frame (group, tokens, lang, hash) is derived in
    ONE text scan and eagerly localCheckpointed (two aggregation
    consumers); both aggregations are map-side-combinable hash aggs
    keyed on low-cardinality groups; the language-mode window runs over
    the |groups| × |langs| count table (bounded by construction — ≤ a
    few dozen rows per group), so it needs no shard cap; the final join
    is |groups|-row × |groups|-row.
    """
    from pyspark.sql import Window

    t = F.col(text_col)
    per_doc = docs.select(
        F.col(group_col).alias("source"),
        token_count_col(t).cast("long").alias("n_toks"),
        lang_id_col(t).alias("lang_pred"),
        F.md5(F.coalesce(t, F.lit(""))).alias("_h"),
    ).localCheckpoint(eager=True)

    stats = (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.round(F.avg("n_toks"), 4).alias("avg_doc_tokens"),
            F.min("n_toks").alias("min_doc_tokens"),
            F.max("n_toks").alias("max_doc_tokens"),
            F.countDistinct("_h").alias("_n_uniq"),
        )
        .withColumn(
            "exact_dup_frac",
            F.round(F.lit(1) - F.col("_n_uniq") / F.col("n_docs"), 4),
        )
        .drop("_n_uniq")
    )
    lang_counts = per_doc.groupBy("source", "lang_pred").agg(
        F.count("*").alias("_cnt")
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("_cnt"), F.asc("lang_pred")
    )
    top = (
        lang_counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("source", F.col("lang_pred").alias("top_lang"), "_cnt")
    )
    return (
        stats.join(F.broadcast(top), "source")
        .withColumn(
            "top_lang_frac", F.round(F.col("_cnt") / F.col("n_docs"), 4)
        )
        .drop("_cnt")
    )
