"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — exact brute-force top-k for a query set: the
  correctness baseline and the right tool when |queries| is small
  (broadcast queries × scan corpus; one partial-aggregating top-k, no
  global sort).
- :func:`ivf_topk` — IVF-style scale path: corpus is assigned to coarse
  cells once; a query probes only its ``n_probe`` nearest cells. At 100 TB
  the cell assignment is a write-time partition column, so a probe prunes
  to n_probe/ n_cells of the data before any distance math.

Cosine is computed with explicit zip_with/aggregate expressions (JVM
codegen; doubles, rounded to 6dp) so the DuckDB oracle replays it
bit-identically. No UDFs anywhere.

Measured dead end (r3, do not re-try): unrolling dot/norm into flat
``0.0 + get(a,0)*get(b,0) + ...`` expression trees at a known dim. At
dim=64 the generated methods pass janino's 64KB limit inside fused
hash-agg stages (whole stage falls back to interpreted) and even where
they compile they exceed HotSpot's JIT huge-method limit — steady-state
timings at sf0.1 were uniformly 2-3x SLOWER than the HOF fold
(knn 0.51s→1.79s, semdedup 1.97s→3.13s, neardup 0.90s→2.10s).
The HOF fold over primitive double arrays is the fast path here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return F.round(dot(a, b) / (norm(a) * norm(b)), 6)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (broadcast queries × corpus)."""
    c = corpus.select(F.col(id_col).alias("nbr_id"),
                      F.col(vec_col).cast("array<double>").alias("nv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    scored = (
        F.broadcast(q).crossJoin(c)
        .where(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", cosine(F.col("qv"), F.col("nv")).alias("cosine"))
    )
    return _topk_per_query(scored, k)


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Two-phase distributed top-k over (query_id, nbr_id, cosine).

    A single ``Window.partitionBy(query_id)`` would shuffle the whole
    scored set into one task per query and sort it there (corpus-sized
    partitions when |queries| is small). Phase 1 takes the top-k within
    each (query, input-partition) slice — a balanced shuffle on the
    compound key — so phase 2 sorts at most k×num_partitions rows per
    query. Identical results (same deterministic tie-break) at any scale.
    """
    part = scored.withColumn("_pid", F.spark_partition_id())
    w1 = Window.partitionBy("query_id", "_pid").orderBy(
        F.desc("cosine"), F.asc("nbr_id"))
    local = (
        part.withColumn("_r", F.row_number().over(w1))
        .where(F.col("_r") <= k)
        .drop("_r", "_pid")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("nbr_id"))
    return (
        local.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    inline_threshold: int = 65_536,
) -> DataFrame:
    """Assign each vector to its nearest centroid.

    Centroids are any deterministic coarse set (e.g. first-C reservoir
    or k-means output); at write time ``cell`` becomes a partition
    column. Two physical shapes, same values and (sim desc, cell asc)
    tie-break:

    - **small sets** (n_cells × dim ≤ ``inline_threshold``): centroids
      inline as literal arrays — map-only, no join, no argmax shuffle,
      and reuse costs only an extra scan. ``norm(v)`` is staged once as
      a real column (HOFs are interpreted; recomputing it per candidate
      was n_cells× the math), centroid norms are pre-computed driver-
      side (same left-fold order, bit-identical doubles).
    - **large sets** (SemDeDup-at-scale uses ~11k cells): the literal
      plan would hold n_cells × dim expression nodes — past codegen and
      analysis limits — so assignment falls back to a broadcast join +
      ``max_by`` argmax (one partial-agg shuffle on the vector id).

    Output carries ``csim`` — the (6dp-rounded) cosine to the winning
    centroid — which IVF ignores but SemDeDup uses as its keep
    priority.
    """
    import math

    c = centroids.select(F.col("cell_id").cast("int").alias("cell_id"),
                         F.col(vec_col).cast("array<double>").alias("cv"))
    head = c.limit(1).collect()
    if not head:
        raise ValueError("assign_cells: empty centroid set")
    dim = len(head[0].cv)
    n_cells = c.count()
    v = corpus.select(F.col(id_col),
                      F.col(vec_col).cast("array<double>").alias("v"))

    if n_cells * dim > inline_threshold:
        scored = v.join(F.broadcast(c)).select(
            id_col, "v", "cell_id",
            cosine(F.col("v"), F.col("cv")).alias("sim"))
        best = scored.groupBy(id_col).agg(
            F.max_by(F.struct("cell_id", "v", "sim"),
                     F.struct(F.col("sim"), -F.col("cell_id"))).alias("_b"))
        return best.select(id_col, F.col("_b.cell_id").alias("cell"),
                           F.col("_b.v").alias("v"),
                           F.col("_b.sim").alias("csim"))

    rows = c.collect()
    staged = v.withColumn("_nv", norm(F.col("v")))
    cands = []
    for r in rows:
        cnorm = math.sqrt(sum(x * x for x in r.cv))  # same left fold
        sim = F.round(
            dot(F.col("v"), F.array(*[F.lit(float(x)) for x in r.cv]))
            / (F.col("_nv") * F.lit(cnorm)), 6)
        cands.append(F.struct(sim.alias("sim"),
                              F.lit(-int(r.cell_id)).alias("negcell")))
    staged = staged.withColumn("_best", F.array_max(F.array(*cands)))
    return staged.select(
        id_col, (-F.col("_best.negcell")).cast("int").alias("cell"), "v",
        F.col("_best.sim").alias("csim"))


def take_centroids(corpus: DataFrame, n_cells: int,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic training-free centroids: the n_cells lowest-id vectors.

    ``orderBy().limit()`` compiles to a distributed TakeOrderedAndProject
    (per-partition top-n, merge on the driver) — an unpartitioned window
    here would drag the whole corpus into one task. The row_number window
    that assigns cell ids then runs over only n_cells rows.
    """
    small = corpus.select(F.col(id_col), F.col(vec_col)) \
        .orderBy(F.asc(id_col)).limit(n_cells)
    w = Window.orderBy(F.asc(id_col))
    return small.select(
        (F.row_number().over(w) - 1).alias("cell_id"), F.col(vec_col))


def write_ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Materialize the IVF layout: vectors partitioned on disk by their
    cell (``cell=<n>/`` directories) plus the centroid table.

    This is the 100 TB shape the in-memory :func:`ivf_topk` only
    simulates — at search time a probe reads n_probe/n_cells of the
    data because partition pruning drops the other cell directories at
    the file-listing level (``PartitionFilters`` in the scan plan, no
    bytes read)."""
    assigned = assign_cells(corpus, centroids, id_col, vec_col)
    (assigned.select(id_col, F.col("v").alias(vec_col), "cell")
     .write.mode(mode).partitionBy("cell").parquet(f"{path}/vectors"))
    centroids.write.mode(mode).parquet(f"{path}/centroids")


def ivf_search(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_probe_rows: int = 100_000,
) -> DataFrame:
    """Top-k over a :func:`write_ivf_index` layout, reading only the
    probed cells.

    The probed cell ids are collected to the driver (bounded by
    |queries| × n_probe — queries are the broadcast-small side by
    contract) so the cell filter is a *literal* IN-list the scan can
    prune partitions with; a join-based filter would have to list every
    cell directory first. ``max_probe_rows`` enforces that contract: a
    corpus-sized query table would otherwise OOM the driver at the
    collect — bulk (corpus × corpus) scoring belongs to
    :func:`ivf_topk`, which never collects query vectors."""
    n_q = queries.count()
    if n_q * n_probe > max_probe_rows:
        raise ValueError(
            f"ivf_search: {n_q} queries x n_probe={n_probe} = "
            f"{n_q * n_probe} probe rows would be collected driver-side "
            f"(cap {max_probe_rows}). For bulk/corpus-sized query sets "
            "use ivf_topk (no driver collect), or raise max_probe_rows "
            "deliberately.")
    cents = spark.read.parquet(f"{path}/centroids")
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    c = cents.select("cell_id",
                     F.col(vec_col).cast("array<double>").alias("cv"))
    qcells = (
        F.broadcast(q).crossJoin(c)
        .select("query_id", "qv", "cell_id",
                cosine(F.col("qv"), F.col("cv")).alias("sim"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"),
                                                F.asc("cell_id"))
    probes = (
        qcells.withColumn("_r", F.row_number().over(wq))
        .where(F.col("_r") <= n_probe)
        .select("query_id", "qv", F.col("cell_id").alias("cell"))
    )
    # one evaluation of the probe pipeline: the collected rows feed BOTH
    # the literal cell filter and (re-localized) the broadcast join —
    # referencing `probes` again in the join would re-run the centroid
    # scan + window a second time
    probe_rows = probes.collect()
    cells = sorted({r.cell for r in probe_rows})
    probes_local = spark.createDataFrame(probe_rows, probes.schema)
    vectors = (
        spark.read.parquet(f"{path}/vectors")
        .where(F.col("cell").isin(cells))
    )
    scored = (
        vectors.join(F.broadcast(probes_local), "cell")
        .where(F.col("query_id") != F.col(id_col))
        .select("query_id", F.col(id_col).alias("nbr_id"),
                cosine(F.col("qv"),
                       F.col(vec_col).cast("array<double>")).alias("cosine"))
    )
    return _topk_per_query(scored, k)


def kmeans_centroids(
    corpus: DataFrame,
    n_cells: int,
    n_iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic distributed k-means training for IVF cells.

    ``take_centroids`` (first-C-by-id) is the training-free oracle
    default, but on clustered real embeddings consecutive ids often
    come from one region, giving badly unbalanced cells. This trains
    proper centroids with only DataFrame ops:

    - seed: the min-id vector of each id-hash bucket (one shuffle;
      spreads the picks across the corpus deterministically, the
      sampling role k-means|| plays — no RNG, so re-runs agree),
    - ``n_iters`` Lloyd rounds: assign (broadcast centroids) → new
      centroid = element-wise member mean via posexplode + partial agg
      (the shuffle carries ~n_cells × dim rows per map task, not the
      corpus). Centroids collect to the driver each round (bounded:
      n_cells × dim doubles); empty cells keep their previous centroid.

    Exactly reproducible up to floating-point summation order in the
    means (partial-agg order is scheduler-dependent); cell *quality* is
    stable, which is what IVF needs — the oracle path stays
    training-free for bit-exact replays.
    """
    spark = corpus.sparkSession
    v = corpus.select(F.col(id_col).alias("_id"),
                      F.col(vec_col).cast("array<double>").alias(vec_col))
    seed = (
        v.withColumn("_b", F.pmod(F.xxhash64(F.col("_id").cast("string")),
                                  F.lit(n_cells)))
        .groupBy("_b").agg(F.min_by(vec_col, "_id").alias(vec_col),
                           F.min("_id").alias("_id"))
        .orderBy("_b")
    )
    picked = seed.collect()
    if len(picked) < n_cells:
        # empty id-hash buckets (small or adversarial corpora): top up
        # from the lowest-id vectors not already chosen so the caller's
        # cell count is honored whenever the corpus has enough rows
        have = {r._id for r in picked}
        extra = [r for r in v.orderBy("_id").limit(n_cells + len(have))
                 .collect() if r._id not in have]
        picked = picked + extra[:n_cells - len(picked)]
    cents = [(i, list(r[vec_col])) for i, r in enumerate(picked)]
    for _ in range(n_iters):
        cdf = spark.createDataFrame(
            cents, f"cell_id int, {vec_col} array<double>")
        assigned = assign_cells(v, cdf, id_col="_id", vec_col=vec_col)
        new = (
            assigned.select("cell", F.posexplode("v").alias("_i", "_x"))
            .groupBy("cell", "_i").agg(F.avg("_x").alias("_m"))
            .groupBy("cell")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("_i", "_m"))),
                lambda s: s["_m"]).alias("cv"))
        )
        got = {r.cell: list(r.cv) for r in new.collect()}
        cents = [(cid, got.get(cid, cv)) for cid, cv in cents]
    return spark.createDataFrame(
        cents, f"cell_id int, {vec_col} array<double>")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the n_probe nearest cells per query.

    ``centroids`` (schema ``cell_id int, <vec_col> array<double>``)
    plugs in trained cells (:func:`kmeans_centroids`); default stays
    the training-free first-C set so the DuckDB oracle replays exactly.
    """
    cents = (centroids if centroids is not None
             else take_centroids(corpus, n_cells, id_col, vec_col))
    assigned = assign_cells(corpus, cents, id_col, vec_col)

    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    c = cents.select("cell_id", F.col(vec_col).cast("array<double>").alias("cv"))
    qcells = (
        F.broadcast(q).crossJoin(c)
        .select("query_id", "qv", "cell_id",
                cosine(F.col("qv"), F.col("cv")).alias("sim"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cell_id"))
    probes = (
        qcells.withColumn("_r", F.row_number().over(wq))
        .where(F.col("_r") <= n_probe)
        .select("query_id", "qv", F.col("cell_id").alias("cell"))
    )
    scored = (
        probes.join(assigned, "cell")
        .where(F.col("query_id") != F.col(id_col))
        .select("query_id", F.col(id_col).alias("nbr_id"),
                cosine(F.col("qv"), F.col("v")).alias("cosine"))
    )
    return _topk_per_query(scored, k)


def hashed_embeddings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """Signed feature-hashing embeddings (Weinberger et al. 2009): each
    document becomes a ``dim``-dimensional vector where token t adds
    ±1 (sign from an independent hash bit) to bucket ``h(t) mod dim``.
    Training-free, deterministic, integer-exact — and a real member of
    the embedding family: feed the output straight into
    :func:`cosine_topk` / :func:`ivf_topk` /
    :func:`~cow_spark.operators.dedup.semdedup` to run the whole
    text → embedding → ANN / semantic-dedup loop inside the engine
    (or as the fallback embedder when no model service exists).

    Plan: explode → per-(doc, bucket) signed sums (the corpus shuffle
    carries ≤ dim rows per doc) → one per-doc map_from_entries rebuild
    into a dense array (zeros for untouched buckets). Documents with no
    tokens get the zero vector — callers that cosine against it should
    mind the 0-norm, exactly as with any degenerate embedding.
    """
    from ..functions.hashing import portable_hash60
    from ..functions.text import normalize_text, tokens

    hashed = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("term"),
    ).select("doc_id", portable_hash60(F.col("term")).alias("_h"))
    vals = (
        hashed.select(
            "doc_id", (F.col("_h") % dim).cast("int").alias("bucket"),
            (1 - 2 * F.pmod(F.expr(f"_h div {dim}"), F.lit(2)))
            .alias("sign"))
        .groupBy("doc_id", "bucket").agg(F.sum("sign").alias("v"))
    )
    dense = (
        vals.groupBy("doc_id")
        .agg(F.map_from_entries(
            F.collect_list(F.struct("bucket", "v"))).alias("_m"))
        .select("doc_id", F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("_m"), i.cast("int")),
                F.lit(0)).cast("double")).alias("embedding"))
    )
    zeros = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                        lambda i: F.lit(0.0))
    return (
        df.select(F.col(id_col).alias("doc_id")).distinct()
        .join(dense, "doc_id", "left")
        .select("doc_id",
                F.coalesce("embedding", zeros).alias("embedding"))
    )


# ---------------------------------------------------------------------------
# product quantization (PQ): the memory/shuffle scale path for ANN
# ---------------------------------------------------------------------------


def pq_subcentroids(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Training-free PQ codebook: the ``k`` lowest-id vectors, sliced
    into ``m`` equal subspaces — `[subspace][code][dim]` driver-side
    lists (m*k*(D/m) = k*D doubles, trivially broadcastable). The
    first-C trick from :func:`take_centroids`, so the DuckDB oracle
    replays the codebook exactly; swap in k-means sub-centroids per
    subspace for real corpora."""
    rows = (corpus.select(F.col(id_col), F.col(vec_col)
                          .cast("array<double>").alias("v"))
            .orderBy(F.asc(id_col)).limit(k).collect())
    if not rows:
        raise ValueError("pq_subcentroids: empty corpus")
    d = len(rows[0]["v"])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    sub = d // m
    return [[list(r["v"][s * sub:(s + 1) * sub]) for r in rows]
            for s in range(m)]


def _sq_l2(a: Column, b: Column) -> Column:
    """Squared L2 via the HOF fold (same interpreted-but-fast shape as
    ``dot`` — see the module docstring's unrolling dead end)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, x: acc + x)


def pq_encode(
    corpus: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — each vector compressed to one code per
    subspace (nearest sub-centroid by squared L2, ties to the lowest
    code). Map-only: the codebook inlines as literals, so encoding a
    10^12-row corpus is a single scan with zero shuffles, and the code
    table it produces is ~D*8/m bytes-per-row smaller than the vectors
    (64x at D=64 float64, m=8) — THAT table is what candidate scoring
    shuffles or broadcasts at 100 TB."""
    m = len(codebook)
    sub = len(codebook[0][0])
    # stage each subspace slice as a real column FIRST: a slice captured
    # inside the candidate fold would re-evaluate per candidate
    # (interpreted-HOF subtree rule)
    v = corpus.select(
        F.col(id_col),
        *[F.slice(F.col(vec_col).cast("array<double>"), s * sub + 1, sub)
          .alias(f"_p{s}") for s in range(m)])
    # ONE transform over the (constant-folded) literal candidate array
    # per subspace, not k separate folds: Catalyst resolves each lambda
    # individually, and the k-fold version's 2*m*k lambdas cost ~10 s of
    # PLAN time at m=8,k=16 (execution was never the problem). The
    # two-arg transform supplies the code index; per-candidate math and
    # fold order are unchanged — bit-identical distances.
    codes = []
    for s in range(m):
        # one nested-array Literal node per subspace (F.lit on the
        # nested list), not m*k*sub individual literals — the analyzer
        # fixed-point walks the whole tree per action, and the
        # exploded-literal version dominated PLAN time
        cands = F.lit([[float(x) for x in c] for c in codebook[s]])
        scored = F.transform(
            cands,
            lambda c, i: F.struct(
                _sq_l2(F.col(f"_p{s}"), c).alias("d"),
                i.alias("code")))
        # array_min on (d, code) structs = argmin with lowest-code ties
        codes.append(F.array_min(scored)["code"].cast("int"))
    return v.select(id_col, F.array(*codes).alias("codes"))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC,
    Jégou et al. 2011): corpus vectors live only as PQ codes; each
    query precomputes a (m x n_codes) lookup table of exact
    query-to-sub-centroid distances, and a candidate's distance is the
    sum of m table lookups — no corpus-side float math at all.

    Scale shape: encode is map-only over the corpus; the LUT is
    computed on the broadcast-small query side; scoring joins the tiny
    query table to the CODE table (m ints per row instead of D
    doubles), then the two-phase top-k. Returns
    ``(query_id, nbr_id, adc_dist, rank)`` — distance ascending.

    Fidelity honesty (measured r3): on clustered embeddings PQ retrieves
    same-cluster neighbors reliably (the candidate-generation contract);
    on near-UNIFORM random vectors no m*log2(k)-bit quantizer preserves
    fine top-k cosine order — pairwise cosines concentrate below the
    quantization noise floor (recall@10 ~0.3 on the synthetic fixture,
    with training-free AND k-means codebooks alike). Use PQ to generate
    candidates and rerank the shortlist with exact cosine when the
    corpus lacks cluster structure.
    """
    # unit-normalize both sides first: squared L2 on unit vectors is
    # 2 - 2*cos, so ADC ranking approximates COSINE ranking (matching
    # cosine_topk/ivf_topk); without it PQ would rank by raw L2.
    def unit(df, out_id):
        vv = df.select(F.col(id_col).alias(out_id),
                       F.col(vec_col).cast("array<double>").alias("v"))
        vv = vv.withColumn("_n", norm(F.col("v"))).where(F.col("_n") > 0)
        return vv.select(
            out_id,
            F.transform(F.col("v"),
                        lambda x: x / F.col("_n")).alias(vec_col))

    ncorpus = unit(corpus, id_col)
    cb = codebook if codebook is not None else pq_subcentroids(
        ncorpus, m, n_codes, id_col, vec_col)
    m = len(cb)
    sub = len(cb[0][0])
    codes = pq_encode(ncorpus, cb, id_col, vec_col) \
        .withColumnRenamed(id_col, "nbr_id")

    q = unit(queries, "query_id") \
        .withColumnRenamed(vec_col, "qv")
    # per-query LUT: lut[s][c] = ||q_s - centroid[s][c]||^2, computed
    # once on the query side (|Q| x m x n_codes doubles). Slices staged
    # as real columns + one transform per subspace — the same plan-time
    # lambda-count discipline as pq_encode.
    q = q.select("query_id",
                 *[F.slice(F.col("qv"), s * sub + 1, sub).alias(f"_q{s}")
                   for s in range(m)])
    def _lut_for(s: int) -> Column:
        # factory binds s (a `s=s` lambda default would make pyspark
        # count 3 HOF parameters and fail analysis); nested-list F.lit
        # = ONE Literal node per subspace (plan-time discipline)
        cands = F.lit([[float(x) for x in c] for c in cb[s]])
        return F.transform(cands, lambda c: _sq_l2(F.col(f"_q{s}"), c))

    lut = F.array(*[_lut_for(s) for s in range(m)])
    q = q.select("query_id", lut.alias("lut"))

    # ADC: sum of m lookups; F.get twice (0-based, NULL-safe under ANSI)
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)), F.lit(0.0),
        lambda acc, s: acc + F.get(F.get(F.col("lut"), s),
                                   F.get(F.col("codes"), s)))
    scored = (
        F.broadcast(q).crossJoin(codes)
        .where(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", adc.alias("adc_dist"))
    )
    part = scored.withColumn("_pid", F.spark_partition_id())
    w1 = Window.partitionBy("query_id", "_pid").orderBy(
        F.asc("adc_dist"), F.asc("nbr_id"))
    local = (part.withColumn("_r", F.row_number().over(w1))
             .where(F.col("_r") <= k).drop("_r", "_pid"))
    w2 = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("nbr_id"))
    return (local.withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= k)
            .select("query_id", "nbr_id", "adc_dist", "rank"))


def pq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    overfetch: int = 10,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: list[list[list[float]]] | None = None,
) -> DataFrame:
    """The production PQ pattern: ADC shortlist (``k * overfetch``
    candidates from the compressed code table) → exact cosine rerank of
    only the shortlist. The exact math touches k*overfetch*|Q| vectors
    instead of |corpus|*|Q| — the two-stage retrieval every large ANN
    system runs.

    Measured (r3, sf0.01 fixture): recall@10 vs exact brute force is
    0.47 / 0.87 / 1.0 at overfetch 4 / 10 / 25 on near-uniform random
    vectors (the worst case for PQ — see :func:`pq_topk`); clustered
    corpora reach full recall at small overfetch."""
    short = pq_topk(corpus, queries, k=k * overfetch, m=m,
                    n_codes=n_codes, id_col=id_col, vec_col=vec_col,
                    codebook=codebook).select("query_id", "nbr_id")
    c = corpus.select(F.col(id_col).alias("nbr_id"),
                      F.col(vec_col).cast("array<double>").alias("nv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    scored = (
        short.join(c, "nbr_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "nbr_id",
                cosine(F.col("qv"), F.col("nv")).alias("cosine"))
    )
    return _topk_per_query(scored, k)


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
    scale: int = 1_000_000,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009): combine any number
    of rankings — BM25 keyword, embedding ANN, recency, … — into
    ``rrf_fp = Σ_r scale div (k + rank_r)``, the standard hybrid-search
    merge (rank-based, so wildly different score scales never need
    calibration). Integer div keeps it engine-exact.

    Each input frame is ``(id_col, rank)`` with rank >= 1. Returns
    ``(id_col, n_lists, rrf_fp)`` — n_lists = how many rankings contain
    the id (ties in rrf_fp break naturally on it downstream). Inputs
    are separate retrieval pipelines by contract; the union is over
    ranking-sized frames (top-k each), not corpora.
    """
    if not rankings:
        raise ValueError("no rankings to fuse")
    parts = [
        r.select(F.col(id_col),
                 F.expr(f"{scale} div ({k} + rank)").alias("_c"))
        for r in rankings
    ]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    return (
        allr.groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_lists"),
             F.sum("_c").cast("long").alias("rrf_fp"))
    )


def scalar_quantize(df: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Per-dimension int8 scalar quantization — the 4× storage shrink
    (float32 → uint8 codes) that makes a 100 TB embedding store
    scannable: SQ is what FAISS/vector stores apply before or instead
    of PQ when recall must stay near-exact. Returns
    ``(id_col, codes array<int>)`` with
    ``code[d] = ⌊(x[d] − mn[d])·255 / (mx[d] − mn[d])⌋`` ∈ 0..255
    (constant dimension → 0); dequantization is
    ``mn[d] + code[d]·(mx[d] − mn[d])/255``.

    Scale shape: pass 1 posexplodes to per-dimension ``min``/``max`` —
    a partial-aggregated shuffle whose output is DIMENSION-sized, then
    collected to the driver (bounded by the vector width, the k-row
    centroid-collect discipline). Pass 2 is MAP-ONLY: the per-dim
    ranges ship as constant-folded array literals inside one HOF
    ``transform`` — no join, no regroup shuffle, no Python. Arithmetic
    stays in exact-replayable territory: float32 → double promotion is
    exact, and the ``((x − mn)·255) / (mx − mn)`` parenthesization is
    fixed so any IEEE-double engine (the DuckDB twin included)
    reproduces the codes bit-for-bit.
    """
    ex = df.select(F.posexplode(vec_col).alias("dim", "x"))
    rng = (ex.groupBy("dim")
           .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
           .orderBy("dim").collect())
    mns = F.lit([float(r.mn) for r in rng])
    mxs = F.lit([float(r.mx) for r in rng])

    def _code(x, i):
        mn = F.element_at(mns, i + 1)
        mx = F.element_at(mxs, i + 1)
        return (F.when(mx == mn, F.lit(0).cast("long"))
                .otherwise(F.floor(
                    ((x.cast("double") - mn) * F.lit(255.0))
                    / (mx - mn))))

    return df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), _code).cast("array<int>")
        .alias("codes"))


def embedding_drift(df: DataFrame, slice_col: str,
                    vec_col: str = "embedding",
                    scale: int = 1000) -> DataFrame:
    """Embedding-space drift between corpus slices (crawl snapshots,
    sources, time halves): per-slice centroid, then pairwise cosine
    between centroids — the semantic companion to corpus_drift's
    token-space divergence. A centroid cosine sliding from 1.0 is the
    earliest signal that a source changed register, language mix, or
    pipeline version.

    Cross-engine exactness is the design driver: a float centroid is
    a DISTRIBUTED SUM whose addition order differs per engine and per
    partition — non-associative doubles would hash-mismatch. So
    elements quantize FIRST (``⌊x·scale⌋`` — float32→double exact,
    one correctly-rounded product, deterministic floor) and
    everything downstream is associative integer math: per-dim sums,
    truncating mean ``s div n`` (Spark ``div`` and DuckDB ``//`` both
    truncate toward zero — pinned equivalent), integer dot/norms, and

        cos6 = sign(dot) · two-limb ⌊10^6·|dot| / ⌊√(n₁·n₂)⌋⌋

    on the exact isqrt (the runs_test sign-magnitude convention; a
    zero centroid reads 0). Quantization at ``scale`` bounds the
    overflow: dim·(scale·x_max)² < 9.2·10^18.

    Scale shape: one scan → quantized posexplode → partial-agg combine
    to the (slice × dim) table; the pairwise join, norms, and isqrt
    all run on that tiny table. Returns
    (slice_a, slice_b, n_a, n_b, cos6).
    """
    from ..functions.intmath import isqrt_col

    ex = df.select(F.col(slice_col).alias("slc"),
                   F.posexplode(vec_col).alias("dim", "x"))
    cent = (ex.groupBy("slc", "dim")
            .agg(F.sum(F.floor(F.col("x").cast("double")
                               * F.lit(scale)).cast("long")).alias("s"),
                 F.count(F.lit(1)).cast("long").alias("n"))
            .select("slc", "dim", F.expr("s div n").alias("m"), "n"))
    a, b = cent.alias("a"), cent.alias("b")
    pairs = (a.join(b, (F.col("a.dim") == F.col("b.dim"))
                    & (F.col("a.slc") < F.col("b.slc")))
             .groupBy(F.col("a.slc").alias("slice_a"),
                      F.col("b.slc").alias("slice_b"))
             .agg(F.sum(F.col("a.m") * F.col("b.m")).cast("long")
                  .alias("dot"),
                  F.max(F.col("a.n")).cast("long").alias("n_a"),
                  F.max(F.col("b.n")).cast("long").alias("n_b")))
    norms = (cent.groupBy("slc")
             .agg(F.sum(F.col("m") * F.col("m")).cast("long")
                  .alias("nrm")))
    j = (pairs
         .join(F.broadcast(norms.withColumnRenamed("slc", "slice_a")
                           .withColumnRenamed("nrm", "nrm_a")),
               "slice_a")
         .join(F.broadcast(norms.withColumnRenamed("slc", "slice_b")
                           .withColumnRenamed("nrm", "nrm_b")),
               "slice_b")
         .select("slice_a", "slice_b", "n_a", "n_b", "dot",
                 isqrt_col((F.col("nrm_a") * F.col("nrm_b"))
                           .cast("long")).alias("r")))
    mag = F.expr("(abs(dot) div r) * 1000000"
                 " + ((abs(dot) % r) * 1000000) div r")
    cos6 = (F.when(F.col("r") > 0,
                   F.when(F.col("dot") < 0, -mag).otherwise(mag))
            .otherwise(F.lit(0)))
    return j.select("slice_a", "slice_b", "n_a", "n_b",
                    cos6.cast("long").alias("cos6"))


def embedding_drift_oracle_sql(rows_sql: str, scale: int = 1000) -> str:
    """DuckDB twin of :func:`embedding_drift`; ``rows_sql`` yields
    (slc, e) with e a float list."""
    from ..functions.intmath import isqrt_fix_sql, isqrt_seed_sql

    return f"""
with v as (select slc, e from ({rows_sql})),
ex0 as (
  select slc,
         unnest(list_transform(generate_series(1, len(e)),
           i -> {{'dim': i - 1,
                  'xi': cast(floor(cast(e[i] as double) * {scale})
                             as bigint)}})) as u
  from v),
cent as materialized (
  select slc, u.dim as dim,
         cast(sum(u.xi) // count(*) as bigint) as m,
         cast(count(*) as bigint) as n
  from ex0 group by slc, u.dim),
pairs as (
  select a.slc as slice_a, b.slc as slice_b,
         cast(sum(a.m * b.m) as bigint) as dot,
         cast(max(a.n) as bigint) as n_a,
         cast(max(b.n) as bigint) as n_b
  from cent a join cent b on a.dim = b.dim and a.slc < b.slc
  group by a.slc, b.slc),
norms as (
  select slc, cast(sum(m * m) as bigint) as nrm
  from cent group by slc),
rad as (
  select slice_a, slice_b, n_a, n_b, dot,
         cast(na.nrm * nb.nrm as bigint) as x
  from pairs
  join norms na on na.slc = slice_a
  join norms nb on nb.slc = slice_b),
t0 as (select *, cast({isqrt_seed_sql('x')} as bigint) as t from rad),
t1 as (select slice_a, slice_b, n_a, n_b, dot, x,
              cast({isqrt_fix_sql('t', 'x')} as bigint) as t from t0),
t2 as (select slice_a, slice_b, n_a, n_b, dot,
              cast({isqrt_fix_sql('t', 'x')} as bigint) as r from t1)
select slice_a, slice_b, n_a, n_b,
  cast(case when r > 0 then
         sign(dot) * ((abs(dot) // r) * 1000000
                      + ((abs(dot) % r) * 1000000) // r)
       else 0 end as bigint) as cos6
from t2
"""


def hard_negatives(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_cells: int = 8,
    k: int = 3,
    max_cell_rows: int = 50_000,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    ``k`` MOST-similar vectors carrying a DIFFERENT label — the pairs
    that actually move an embedding model (random negatives are
    trivially separable; in-batch negatives are whatever shuffled in).

    Candidate generation is celled, never all-pairs: training-free
    first-``n_cells`` centroids (deterministic, so the oracle replays
    the assignment — the IVF/SemDeDup discipline), pairs only within
    a cell. A hard negative outside the anchor's cell is by
    construction not hard (it lost the coarse-quantizer argmax), so
    the cell boundary is the honest recall trade every ANN-backed
    miner makes. ``max_cell_rows`` RAISES on a degenerate cell (one
    cell holding the corpus = a silent all-pairs join) — raise
    ``n_cells`` instead of the cap.

    Similarity is the 6dp-rounded cosine (the assign_cells
    convention); ranks break ties by neighbor id. Scale shape: one
    assignment pass (map-only for small centroid sets), one
    cell-keyed self-join bounded by cell sizes, one per-anchor top-k
    window (many small groups). Returns
    (anchor_id, nbr_id, anchor_label, nbr_label, cos4, rank).
    """
    cents = take_centroids(df, n_cells, id_col=id_col,
                           vec_col=vec_col)
    assigned = assign_cells(df, cents, id_col=id_col, vec_col=vec_col)
    labeled = assigned.join(
        df.select(F.col(id_col), F.col(label_col).alias("_lbl")),
        id_col)
    biggest = (labeled.groupBy("cell").agg(F.count(F.lit(1)).alias("c"))
               .agg(F.max("c")).collect()[0][0])
    if biggest and biggest > max_cell_rows:
        raise ValueError(
            f"hard_negatives: a cell holds {biggest} rows "
            f"(> max_cell_rows={max_cell_rows}) — raise n_cells; a "
            f"degenerate cell is a silent all-pairs join")
    a = labeled.select(F.col(id_col).alias("anchor_id"),
                       F.col("v").alias("va"), "cell",
                       F.col("_lbl").alias("anchor_label"))
    b = labeled.select(F.col(id_col).alias("nbr_id"),
                       F.col("v").alias("vb"), "cell",
                       F.col("_lbl").alias("nbr_label"))
    pairs = (a.join(b, "cell")
             .where((F.col("anchor_id") != F.col("nbr_id"))
                    & (F.col("anchor_label") != F.col("nbr_label")))
             .select("anchor_id", "nbr_id", "anchor_label",
                     "nbr_label",
                     F.round(cosine(F.col("va"), F.col("vb")), 6)
                     .alias("sim")))
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("sim").desc(), F.col("nbr_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("anchor_id", "nbr_id", "anchor_label", "nbr_label",
                    F.floor(F.col("sim") * 10_000).cast("long")
                    .alias("cos4"),
                    F.col("rank").cast("int").alias("rank")))


def random_projection(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 8,
    scale: int = 1000,
    salt: str = "rp-v1",
) -> DataFrame:
    """Johnson–Lindenstrauss sign projection — the dimensionality
    crush (64→8, 768→64) run before LSH bucketing or coarse
    clustering at 100 TB, when even the float32 vectors are too wide
    to shuffle: ``y[d] = Σ_j s(d,j)·⌊x[j]·scale⌋`` with signs ±1
    drawn from the portable md5 of (salt, d, j) — training-free,
    deterministic, and (by Achlioptas 2001) distance-preserving in
    expectation exactly like a Gaussian matrix.

    Exactness: elements quantize before any aggregation (the
    :func:`embedding_drift` rule — distributed float sums are
    order-nonassociative) and everything after is associative integer
    math the twin replays bit-for-bit. Overflow contract:
    dim·scale·x_max < 9.2·10^18 per output coordinate — vast.

    Scale shape: the sign matrix is out_dim×dim and ships as a
    broadcast (built driver-side from the same md5 the engines use);
    the corpus posexplodes once, joins the broadcast on the input
    dimension, and partial-aggs to (id, d) — the shuffle carries
    out_dim rows per vector, the whole point of projecting before
    shuffling. Returns (id, proj array<long>) dense in output order;
    empty/NULL vectors yield the zero vector.
    """
    import hashlib

    spark = df.sparkSession
    # sign(d, j) for all j up to the observed max dim — probe one row
    head = df.select(F.size(vec_col).alias("n")) \
        .agg(F.max("n")).collect()[0][0] or 0
    signs = []
    for d in range(out_dim):
        for j in range(head):
            h = int(hashlib.md5(
                f"rp|{salt}|{d}|{j}".encode()).hexdigest()[:15], 16)
            signs.append((d, j, 1 - 2 * (h % 2)))
    sdf = spark.createDataFrame(signs, "d int, j int, s int")

    ex = df.select(F.col(id_col).alias("_id"),
                   F.posexplode(vec_col).alias("j", "x")) \
        .select("_id", "j",
                F.floor(F.col("x").cast("double") * F.lit(scale))
                .cast("long").alias("xq"))
    proj = (ex.join(F.broadcast(sdf), "j")
            .groupBy("_id", "d")
            .agg(F.sum(F.col("s") * F.col("xq")).cast("long")
                 .alias("y")))
    dense = (proj.groupBy("_id")
             .agg(F.map_from_entries(
                 F.collect_list(F.struct("d", "y"))).alias("_m"))
             .select("_id", F.transform(
                 F.sequence(F.lit(0), F.lit(out_dim - 1)),
                 lambda i: F.coalesce(
                     F.element_at(F.col("_m"), i.cast("int")),
                     F.lit(0)).cast("long")).alias("proj")))
    zeros = F.transform(F.sequence(F.lit(0), F.lit(out_dim - 1)),
                        lambda i: F.lit(0).cast("long"))
    return (df.select(F.col(id_col).alias("_id")).distinct()
            .join(dense, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    F.coalesce("proj", zeros).alias("proj")))


def random_projection_oracle_sql(rows_sql: str, out_dim: int,
                                 scale: int = 1000,
                                 salt: str = "rp-v1") -> str:
    """DuckDB twin of :func:`random_projection`; ``rows_sql`` yields
    (id, e). Output is the EXPLODED (id, d, y) form (the entry
    posexplodes the packed array to match)."""
    h = (f"cast(concat('0x', substr(md5('rp|{salt}|' "
         f"|| cast(d as varchar) || '|' || cast(j as varchar)), "
         f"1, 15)) as bigint)")
    return f"""
with v as (select id, e from ({rows_sql})),
ex0 as (
  select id,
         unnest(list_transform(generate_series(1, len(e)),
           i -> {{'j': i - 1,
                  'xq': cast(floor(cast(e[i] as double) * {scale})
                             as bigint)}})) as u
  from v),
exq as materialized (
  select id, u.j as j, u.xq as xq from ex0)
select id, cast(d as int) as d,
       cast(sum((1 - 2 * ({h} % 2)) * xq) as bigint) as y
from exq, generate_series(0, {out_dim - 1}) t(d)
group by id, d
"""
