"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket
join), SimHash (bitwise sketch + hamming), and word-n-gram Jaccard
verification. All hashing is md5-based (:mod:`..functions.hashing`) so
the DuckDB oracle can replay every stage bit-exactly.

Scale notes:
- candidate generation is always *blocked* (band buckets / sketch
  buckets); nothing here ever does an unblocked O(n²) self-join.
- the band-bucket self-join keys are salted by construction (band index
  is part of the key) and bounded with a per-bucket cap to survive
  adversarial buckets (e.g. empty documents all sharing one signature).
- pair outputs are canonicalized as (a < b) so downstream dedup of the
  pair list is a cheap distinct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import portable_hash60
from ..functions.text import fingerprint, normalize_text, tokens


def _attach_persisted(out: DataFrame, *persisted: DataFrame) -> DataFrame:
    """Record sketch/bucket tables an operator persisted on behalf of
    ``out`` so callers can release them (see :func:`release`)."""
    held = list(getattr(out, "_cow_persisted", ()))
    held.extend(persisted)
    out._cow_persisted = held
    return out


def release(df: DataFrame) -> int:
    """Unpersist the bounded sketch/bucket tables an operator cached
    while building ``df``. Call after the result is materialized (or no
    longer needed) in long-lived sessions running many dedup passes —
    otherwise the MEMORY_AND_DISK entries accumulate until session end.

    Must be called on the DataFrame an operator *returned* — the handle
    rides on that exact object, so a derived frame
    (``pairs.where(...)``) has nothing to release; that case warns and
    returns 0 instead of silently leaking. Returns the number of tables
    released.
    """
    held = getattr(df, "_cow_persisted", ())
    if not held:
        import warnings

        warnings.warn(
            "release() found no cached tables on this DataFrame — either "
            "this operator persists nothing (then release is a no-op), or "
            "a derived frame was passed (handles ride on the operator's "
            "return value itself, e.g. release(pairs) before .where(...))",
            stacklevel=2)
        return 0
    for p in held:
        p.unpersist()
    return len(held)

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents.

    One shuffle on the fingerprint; min(id) is the canonical survivor.
    """
    fp = df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    # NULL text has no fingerprint — grouping NULLs would report
    # unrelated empty documents as byte-identical duplicates
    fp = fp.where(F.col("fp").isNotNull())
    return (
        fp.groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("canonical_id"),
            F.sort_array(F.collect_list(id_col)).alias("members"),
        )
        .where(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# shingling + minhash
# ---------------------------------------------------------------------------


def word_shingles(c: Column, n: int = 3) -> Column:
    """Distinct word n-grams of the normalized text (empty-safe).

    NOTE: prefer :func:`shingles_from_tokens` over a *staged* token
    column for bulk use — higher-order functions are interpreted, so the
    tokenization subtree here is re-evaluated on every element access
    inside the lambda (O(n_tokens²) per doc)."""
    return shingles_from_tokens(tokens(normalize_text(c)), n)


def shingles_from_tokens(t: Column, n: int = 3,
                         distinct: bool = True) -> Column:
    """Word n-grams from an already-materialized token array.

    ``distinct=True`` (the dedup/LSH contract) returns the shingle SET;
    ``distinct=False`` keeps multiplicity — what repetition measurement
    needs (:mod:`.quality` counts the mode of exactly these grams).
    """
    # s-n+1 shingles → indices 0..s-n inclusive (greatest() keeps the
    # sequence ascending for short docs; that branch is guarded below)
    idx = F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(t, (i + j + 1).cast("int"))
                                          for j in range(n)])
    )
    # documents shorter than n words fall back to their full normalized text
    grams = F.when(F.size(t) >= n, grams).otherwise(
        F.when(F.size(t) > 0, F.array(F.concat_ws(" ", t))).otherwise(
            F.array().cast("array<string>"))
    )
    return F.array_distinct(grams) if distinct else grams


# one md5 per shingle + k affine mixes over a prime field — k× less
# hashing than k seeded md5s, same minhash semantics (each mix is a
# near-uniform permutation of shingle space) and bit-identical integer
# arithmetic in DuckDB for the oracle replay
MINHASH_P = 1_000_000_007
MIX_A = [769_230_769 + 2 * i + 1 for i in range(64)]
MIX_B = [104_395_301 * (i + 1) % MINHASH_P for i in range(64)]


def _mix(base: Column, i: int) -> Column:
    m = F.pmod(base, F.lit(MINHASH_P))
    return F.pmod(m * F.lit(MIX_A[i]) + F.lit(MIX_B[i]), F.lit(MINHASH_P))


def minhash_signature(shingles: Column, k: int = 8) -> Column:
    """k independent min-hashes as bigints (array-expression variant of
    :func:`minhash_signatures`; same values)."""

    def seeded(i: int):
        # NB: a plain `lambda s, i=i:` would match pyspark's 2-arg
        # (element, index) lambda form and silently rebind i to the index
        return lambda s: _mix(portable_hash60(s), i)

    sigs = [F.array_min(F.transform(shingles, seeded(i))) for i in range(k)]
    return F.array(*sigs)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    n: int = 3,
) -> DataFrame:
    """(id, sig array<bigint>) via explode + k min-aggregates.

    Identical values to :func:`minhash_signature`, but the plan is
    explode → partial map-side min → one small shuffle, instead of k
    array traversals in a single projection — the all-in-one expression
    tree overflows janino's 64KB method limit at k=8 and silently drops
    the whole stage to interpreted mode (~20× slower).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(normalize_text(F.col(text_col))).alias("_tok"),
    )
    sh = toks.select(
        "doc_id",
        F.explode(shingles_from_tokens(F.col("_tok"), n)).alias("s"),
    ).withColumn("_h", portable_hash60(F.col("s")))
    aggs = [F.min(_mix(F.col("_h"), i)).alias(f"_s{i}") for i in range(k)]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[F.col(f"_s{i}") for i in range(k)]).alias("sig")
    )


def minhash_band_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
) -> DataFrame:
    """(doc_id, band, band_key) — the LSH bucket membership table.

    This IS the persistent dedup index: write it partitioned by band
    (:func:`write_lsh_index`) and every future batch probes it without
    recomputing the corpus (:func:`incremental_lsh_candidates`).

    Plan note: one band-struct explode instead of a per-band union —
    Spark has no CSE across union branches, so a union re-executes the
    whole shingle→minhash pipeline once per band.
    """
    rows_per_band = k // bands
    sig = minhash_signatures(df, id_col, text_col, k).where(F.size("sig") > 0)
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("|", *[
                F.element_at("sig", b * rows_per_band + j + 1)
                for j in range(rows_per_band)
            ]).alias("band_key"),
        )
        for b in range(bands)
    ])
    return (
        sig.select("doc_id", F.explode(band_structs).alias("_x"))
        .select("doc_id", "_x.band", "_x.band_key")
    )


def write_lsh_index(
    band_table: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Materialize the band table partitioned by band — batch probes
    filter on band first, so partition pruning skips 3/4 of the index
    at bands=4 before any row is read. ``mode='append'`` is the
    index-maintenance path: after a batch is admitted, append its band
    rows and the index stays current."""
    band_table.write.mode(mode).partitionBy("band").parquet(path)


def incremental_lsh_candidates(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    bucket_cap: int = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs for an INCOMING batch against an
    existing corpus index (plus within the batch itself) — the
    production dedup pattern: the corpus is deduplicated once, its band
    table persists, and each new batch costs O(batch), never O(corpus).

    Returns (id_new, id_other) with id_new from the batch; id_other is
    an index doc or an earlier batch doc. Scale shape: the batch band
    table is batch-sized, so it BROADCASTS against the index scan — the
    corpus-scale index is never shuffled; with a band-partitioned
    on-disk index the probe also prunes whole band partitions.
    ``bucket_cap`` drops degenerate buckets by their COMBINED
    (index + batch) size, matching :func:`minhash_lsh_pairs` semantics
    on the union corpus.

    ``index`` carries the :func:`minhash_band_table` schema —
    (doc_id, band, band_key) with that exact id name regardless of
    ``id_col`` (which names the id in ``batch``). A batch doc whose id
    already exists in the index (at-least-once redelivery) never pairs
    with itself.
    """
    nb = minhash_band_table(batch, id_col, text_col, k, bands).persist()
    idx = index.select("doc_id", "band", "band_key")
    # restrict the index to buckets the batch touches (broadcast semi
    # join = the pruning scan), THEN size the combined buckets
    touched = idx.join(
        F.broadcast(nb.select("band", "band_key").distinct()),
        ["band", "band_key"])
    # distinct before sizing: on crash-replay a batch doc's bands exist
    # on BOTH sides, and double-counting them could push a bucket over
    # the cap that was under it pre-crash — changing the admission set
    # between the original run and its replay
    combined = touched.unionByName(nb).dropDuplicates(
        ["doc_id", "band", "band_key"])
    oversized = (
        combined.groupBy("band", "band_key").agg(F.count("*").alias("_bn"))
        .where(F.col("_bn") > bucket_cap)
        .select("band", "band_key")
    )
    sized_new = nb.join(F.broadcast(oversized), ["band", "band_key"],
                        "left_anti")
    sized_old = touched.join(F.broadcast(oversized), ["band", "band_key"],
                             "left_anti")
    vs_index = (
        sized_new.alias("n").join(F.broadcast(sized_old.alias("o")),
                                  ["band", "band_key"])
        .where(F.col("n.doc_id") != F.col("o.doc_id"))
        .select(F.col("n.doc_id").alias("id_new"),
                F.col("o.doc_id").alias("id_other"))
    )
    a, b = sized_new.alias("a"), sized_new.alias("b")
    within = (
        a.join(b, ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_new"),
                F.col("b.doc_id").alias("id_other"))
    )
    pairs = vs_index.unionByName(within).distinct()
    return _attach_persisted(pairs, nb)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    bucket_cap: int = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded minhash-LSH.

    k minhashes split into ``bands`` bands of k/bands rows each; documents
    sharing any full band land in one bucket; pairs within a bucket are
    candidates. ``bucket_cap`` drops degenerate buckets (log-and-drop is
    the 100 TB-safe behavior; a single pathological bucket otherwise
    produces a quadratic task).
    """
    buckets = minhash_band_table(df, id_col, text_col, k, bands)
    # the bucket table feeds three consumers (size stats + both self-join
    # sides); without persisting, the whole shingle→minhash pipeline runs
    # three times (AQE breaks ReuseExchange for it). Unlike the corpus,
    # this is a sketch table (~4 short rows per doc, orders of magnitude
    # smaller than the documents) — persisting it is the right trade;
    # MEMORY_AND_DISK spills rather than OOMs. The handle is attached to
    # the returned DataFrame: ``release(pairs)`` frees it.
    buckets = buckets.persist()

    # only the OVERSIZED buckets matter for the guard, and there can be
    # at most n_rows×bands / bucket_cap of them — a bounded-small set,
    # so the guard is a broadcast anti-join instead of shuffling the
    # corpus-scale bucket table against its full size histogram
    oversized = (
        buckets.groupBy("band", "band_key").agg(F.count("*").alias("_bn"))
        .where(F.col("_bn") > bucket_cap)
        .select("band", "band_key")
    )
    sized = buckets.join(F.broadcast(oversized), ["band", "band_key"],
                         "left_anti")

    a, b = sized.alias("a"), sized.alias("b")
    pairs = (
        a.join(b, ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    return _attach_persisted(pairs, buckets)


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Verify candidate pairs with word-n-gram Jaccard similarity.

    Shingles are computed only for documents that appear in a candidate
    pair (semi-join first) — at 100 TB the pair set is orders of
    magnitude smaller than the corpus.
    """
    # explode, not a two-branch union — a union would re-execute the
    # candidate-pair pipeline once per branch
    ids = (
        pairs.select(F.explode(F.array("id_a", "id_b")).alias("doc_id"))
        .distinct()
    )
    needed = df.join(ids, df[id_col] == ids["doc_id"], "left_semi")
    toks = needed.select(F.col(id_col).alias("doc_id"),
                         tokens(normalize_text(F.col(text_col))).alias("_tok"))
    sh = toks.select("doc_id",
                     shingles_from_tokens(F.col("_tok"), n).alias("sh"))
    j = (
        pairs.join(sh.withColumnRenamed("doc_id", "id_a")
                     .withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("doc_id", "id_b")
                 .withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, F.round(inter / union.cast("double"), 6)).otherwise(0.0)
    return (
        j.select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Verify candidate pairs with word-n-gram Jaccard CONTAINMENT —
    the asymmetric complement of :func:`jaccard_pairs`. Resemblance
    misses the quote/subset case entirely (a paragraph embedded in a
    long document has tiny Jaccard but containment ≈ 1), so this is the
    verifier for quote detection, near-containment dedup of expanded
    revisions, and wrapper-page collapse.

    Returns ``(id_a, id_b, cont_a_in_b, cont_b_in_a)`` — both
    directions from one intersection (|A∩B|/|A| and |A∩B|/|B|), kept
    when EITHER direction clears ``threshold``. Same scale shape as
    Jaccard verify: shingles only for pair participants (semi-join),
    the pair set being orders of magnitude smaller than the corpus.
    Candidate generation caveat: MinHash-LSH recalls by *resemblance*;
    for small-⊂-large pairs seed candidates from shared rare shingles
    or :func:`winnowing_fingerprints` matches instead.
    """
    ids = (
        pairs.select(F.explode(F.array("id_a", "id_b")).alias("doc_id"))
        .distinct()
    )
    needed = df.join(ids, df[id_col] == ids["doc_id"], "left_semi")
    toks = needed.select(F.col(id_col).alias("doc_id"),
                         tokens(normalize_text(F.col(text_col))).alias("_tok"))
    sh = toks.select("doc_id", F.size("_tok").alias("nt"),
                     shingles_from_tokens(F.col("_tok"), n).alias("sh"))
    j = (
        pairs.join(sh.withColumnRenamed("doc_id", "id_a")
                     .withColumnRenamed("sh", "sh_a")
                     .withColumnRenamed("nt", "nt_a"), "id_a")
        .join(sh.withColumnRenamed("doc_id", "id_b")
                 .withColumnRenamed("sh", "sh_b")
                 .withColumnRenamed("nt", "nt_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    # a side shorter than n tokens has NO true n-grams — its fallback
    # whole-text shingle can never match the other side's n-grams, so a
    # 0 here would be a lie about the exact case this operator exists
    # for; report NULL = "not measurable at this n, lower n"
    ca = F.when(F.col("nt_a") >= n,
                F.round(inter / F.size("sh_a").cast("double"), 6))
    cb = F.when(F.col("nt_b") >= n,
                F.round(inter / F.size("sh_b").cast("double"), 6))
    return (
        j.select("id_a", "id_b", ca.alias("cont_a_in_b"),
                 cb.alias("cont_b_in_a"))
        .where((F.col("cont_a_in_b") >= threshold)
               | (F.col("cont_b_in_a") >= threshold))
    )


def near_duplicate_groups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    k: int = 8,
    bands: int = 4,
    bucket_cap: int = 1000,
    n: int = 3,
    cc_local_threshold: int = 100_000,
) -> DataFrame:
    """The full training-corpus dedup composition (the C4/pile recipe):
    MinHash-LSH candidates → word-n-gram Jaccard verification at
    ``threshold`` → connected components over the verified pair graph →
    one row per input document: ``(doc_id, group_id, is_canonical)``
    with ``group_id`` = the group's min doc id and exactly one
    canonical survivor per group (singletons are their own group).
    Filtering ``is_canonical`` yields the deduplicated corpus.

    Every stage is the bounded/blocked operator it composes: LSH never
    self-joins an uncapped bucket, Jaccard shingles only pair
    participants, and CC runs over the verified-pair graph — which is
    pair-sized, not corpus-sized (near-dup groups, not all documents).
    ``cc_local_threshold``: verified pair graphs at or below this edge
    count solve with the driver union-find (one job) instead of ~25
    iterative distributed rounds of pure scheduler overhead; larger
    graphs take the distributed path automatically.

    Exact duplicates travel on a SEPARATE edge layer: ``bucket_cap``
    protects the LSH self-join from degenerate buckets, but a cluster
    of >cap byte-identical documents (boilerplate pages, mass-crawled
    mirrors — exactly what dedup exists for) would then escape grouping
    entirely. Fingerprint star-edges (min-id ↔ member) come from a
    groupBy — no self-join, so no cap needed, and the giant cluster
    costs O(cluster) edges, not O(cluster²).
    """
    from .canon import connected_components

    pairs = minhash_lsh_pairs(df, id_col, text_col, k=k, bands=bands,
                              bucket_cap=bucket_cap)
    # pair-sized (near-dup groups, not corpus) — persisting it means the
    # CC stage's checkpoint/count actions read the verified pairs once
    # instead of replaying the whole shingle→minhash→jaccard pipeline
    verified = jaccard_pairs(df, pairs, id_col, text_col, n=n,
                             threshold=threshold).persist()
    fp = df.select(F.col(id_col).alias("doc_id"),
                   fingerprint(F.col(text_col)).alias("_f"))
    fp = fp.where(F.col("_f").isNotNull())
    star = fp.groupBy("_f").agg(F.min("doc_id").alias("src"))
    exact_edges = (
        fp.join(star, "_f")
        .where(F.col("doc_id") != F.col("src"))
        .select("src", F.col("doc_id").alias("dst"))
    )
    edges = verified.select(F.col("id_a").alias("src"),
                            F.col("id_b").alias("dst")).unionByName(exact_edges)
    comps = connected_components(
        edges, local_threshold=cc_local_threshold
    ).withColumnRenamed("node", "doc_id")
    out = (
        df.select(F.col(id_col).alias("doc_id"))
        .join(comps, "doc_id", "left")
    )
    group = F.coalesce(F.col("component"), F.col("doc_id"))
    res = out.select(
        "doc_id",
        group.alias("group_id"),
        (F.col("doc_id") == group).alias("is_canonical"),
    )
    return _attach_persisted(res, verified,
                             *getattr(pairs, "_cow_persisted", ()))


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(c: Column, bits: int = SIMHASH_BITS) -> Column:
    """Bitwise majority sketch over token hashes — one expression tree,
    no explode: for each bit j, sum ±1 over tokens; set bit if sum > 0.

    NOTE: expression-tree variant for ad-hoc / small use only. The
    ``hashes`` subtree is captured by ``bits`` separate interpreted
    ``F.aggregate`` lambdas, so the md5-per-token work is re-evaluated
    ~``bits``× per row. Bulk pipelines must use
    :func:`simhash_sketches` (same values, hash-once plan)."""
    t = tokens(normalize_text(c))
    hashes = F.transform(t, lambda x: portable_hash60(x))
    def bit_vote(j: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("bigint")
    for j in range(bits):
        bit_sum = F.aggregate(hashes, F.lit(0).cast("bigint"), bit_vote(j))
        out = out + F.when(bit_sum > 0, F.lit(2 ** j).cast("bigint")).otherwise(0)
    return F.when(F.size(t) > 0, out)


def simhash_sketches(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """(doc_id, sh) — bit-identical to :func:`simhash`, but the plan is
    explode → md5-once-per-token → ``bits`` conditional partial sums →
    one small shuffle of (doc_id, bits × long). The expression variant
    re-evaluates the token-hash subtree once per bit inside interpreted
    higher-order lambdas (~``bits``× wasted CPU on the corpus scan).

    Documents with no tokens get ``sh = NULL`` (matching the expression
    variant); ``explode_outer`` keeps their rows alive through the agg.
    """
    ex = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode_outer(tokens(normalize_text(F.col(text_col)))).alias("_t"),
        )
        .withColumn("_h", portable_hash60(F.col("_t")))
    )
    # NULL _h (tokenless doc) must not fall into otherwise(-1): route it
    # to NULL so sum() ignores it and count() can gate the final NULL
    votes = [
        F.sum(
            F.when(F.col("_h").isNull(), F.lit(None).cast("bigint"))
            .when(F.shiftright("_h", j).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"_b{j}")
        for j in range(bits)
    ]
    agg = ex.groupBy("doc_id").agg(F.count("_h").alias("_n"), *votes)
    out = F.lit(0).cast("bigint")
    for j in range(bits):
        out = out + F.when(F.col(f"_b{j}") > 0,
                           F.lit(2 ** j).cast("bigint")).otherwise(0)
    return agg.select(
        "doc_id", F.when(F.col("_n") > 0, out).alias("sh"))


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    band_bits: int = 8,
    bits: int = SIMHASH_BITS,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-dup pairs: bucket on simhash byte-bands (any of bits/band_bits
    bands equal → candidate), verify hamming ≤ max_hamming.

    At the 32-bit/8-bit-band default there are only 4×256 possible
    buckets — fine up to ~10⁵-10⁶ docs, but every bucket goes quadratic
    on a web-scale corpus. For those, widen the sketch (``bits`` up to
    60 — portable_hash60's width) and the bands (``band_bits=16`` →
    65k buckets per band), and set ``bucket_cap`` to drop the
    degenerate buckets that remain (same bounded-small broadcast
    anti-join as :func:`minhash_lsh_pairs`; None keeps every bucket —
    the oracle default)."""
    s = simhash_sketches(df, id_col, text_col, bits).where(
        F.col("sh").isNotNull())
    n_bands = bits // band_bits
    # explode instead of per-band union (no CSE across union branches —
    # the sketch would be recomputed per band, per join side); persist so
    # the self-join's two sides share one sketch computation
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("sh"), b * band_bits)
            .bitwiseAND(F.lit((1 << band_bits) - 1)).alias("band_key"),
        )
        for b in range(n_bands)
    ])
    cached = (
        s.select("doc_id", "sh", F.explode(band_structs).alias("_x"))
        .select("doc_id", "sh", "_x.band", "_x.band_key")
        .persist()
    )
    bu = cached
    if bucket_cap is not None:
        oversized = (
            bu.groupBy("band", "band_key").agg(F.count("*").alias("_bn"))
            .where(F.col("_bn") > bucket_cap)
            .select("band", "band_key")
        )
        bu = bu.join(F.broadcast(oversized), ["band", "band_key"],
                     "left_anti")
    a, b2 = bu.alias("a"), bu.alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    pairs = (
        a.join(b2, ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"),
                ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return _attach_persisted(pairs, cached)


# ---------------------------------------------------------------------------
# embedding near-dup (cosine within sign-sketch buckets)
# ---------------------------------------------------------------------------


def embedding_sign_sketch(vec: Column, bits: int = 16) -> Column:
    """Sketch = sign bits of the first ``bits`` components (a fixed,
    training-free hyperplane family — axis-aligned)."""
    out = F.lit(0).cast("bigint")
    for j in range(bits):
        out = out + F.when(F.element_at(vec, j + 1) > 0,
                           F.lit(2 ** j).cast("bigint")).otherwise(0)
    return out


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.99,
    bits: int = 16,
    bucket_cap: int = 1000,
) -> DataFrame:
    """Near-identical embeddings: bucket by sign sketch, verify cosine.
    Two near-identical vectors share all sign bits with overwhelming
    probability, so recall loss is confined to near-zero components.

    ``bucket_cap`` drops degenerate buckets before the self-join — real
    embedding distributions are anisotropic (post-ReLU / whitened), so
    many vectors can share one sign pattern, and the in-bucket join is
    quadratic. The size table is at most ``2**bits`` rows, so the guard
    is a broadcast join — no extra shuffle on the corpus. (For very
    large corpora also raise ``bits`` to 32-64 so honest buckets stay
    small.)"""
    v = df.select(F.col(id_col).alias("vec_id"),
                  F.col(vec_col).cast("array<double>").alias("v"))
    v = v.withColumn("sk", embedding_sign_sketch(F.col("v"), bits))
    # persist the allowed-bucket list (≤ 2**bits rows), NOT the corpus:
    # without it, each self-join side's broadcast re-runs the size scan
    # over the embedding table (AQE breaks exchange reuse) — the guard
    # would double corpus I/O instead of costing one bounded scan
    ok = (
        v.groupBy("sk").agg(F.count("*").alias("_bn"))
        .where(F.col("_bn") <= bucket_cap)
        .select("sk")
        .persist()
    )
    v = v.join(F.broadcast(ok), "sk")
    a, b = v.alias("a"), v.alias("b")
    dot = F.aggregate(F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.col("a.v"), F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(F.col("b.v"), F.lit(0.0), lambda acc, x: acc + x * x))
    cos = F.round(dot / (na * nb), 6)
    pairs = (
        a.join(b, "sk")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"),
                cos.alias("cosine"))
        .where(F.col("cosine") >= min_cosine)
    )
    return _attach_persisted(pairs, ok)


# ---------------------------------------------------------------------------
# SemDeDup (semantic dedup within k-means cells)
# ---------------------------------------------------------------------------


def _pair_dot_arrow(a: Column, b: Column) -> Column:
    """Vectorized pair dot product for :func:`semdedup`'s Arrow kernel.

    Reproduces the interpreted HOF fold BIT-EXACTLY: the fold computes
    ``acc = acc + a[d]*b[d]`` left-to-right, so the kernel runs 64
    whole-batch fused steps in the same order instead of numpy's
    pairwise-summed ``(a*b).sum()`` (which rounds differently at the
    6th decimal exactly where the eps boundary lives). One Arrow
    crossing for the entire candidate-pair batch; defined lazily so
    importing dedup.py never requires pandas.
    """
    import numpy as np  # local: executor-side too
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    def _dot(xs, ys):
        if xs.empty:
            return pd.Series(np.zeros(0))
        xa = np.stack(xs.to_numpy())
        xb = np.stack(ys.to_numpy())
        acc = np.zeros(len(xs), dtype=np.float64)
        for d in range(xa.shape[1]):
            acc = acc + xa[:, d] * xb[:, d]
        return pd.Series(acc)

    # real annotation objects: this module's `from __future__ import
    # annotations` would stringify inline hints, and pyspark resolves
    # them against module globals where the lazy `pd` doesn't exist
    _dot.__annotations__ = {
        "xs": pd.Series, "ys": pd.Series, "return": pd.Series}
    return pandas_udf(_dot, "double")(a, b)


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 0.95,
    n_cells: int = 16,
    centroids: DataFrame | None = None,
    cell_cap: int = 100_000,
    pair_kernel: str = "hof",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster embeddings
    into coarse cells, then drop all but one member of every within-cell
    group of semantically near-identical vectors (cosine >= ``eps``).

    Keep rule (deterministic, order-independent): rows are prioritized by
    (centroid similarity ASC, id ASC) — the paper keeps the example
    *least* similar to its cluster centroid; a row is dropped iff some
    higher-priority row in the same cell is within ``eps`` of it. This is
    pair-dominance rather than the paper's sequential greedy sweep (a
    sequential scan cannot be expressed as a distributed join); it can
    only over-drop relative to greedy, never under-dedup.

    Scale shape: the pairwise verify is quadratic *within a cell* — that
    is inherent to SemDeDup and is why the paper uses ~11k clusters for
    600M docs. ``cell_cap`` keeps the in-cell join bounded against
    degenerate clusterings: the *dominating* join side is restricted to
    under-cap cells, so every member of an oversized cell is matchless
    and retained wholesale — the conservative failure mode for a *dedup*
    operator. The allowed-cell table is at most |centroids| rows — a
    broadcast, no shuffle on the corpus. Pass trained
    :func:`~cow_spark.operators.simsearch.kmeans_centroids` for real
    corpora; the default training-free first-C cells keep the DuckDB
    oracle bit-exact.

    Returns every input row annotated: ``(id_col, cell, csim, kept)``
    with ``kept`` = 1 for survivors. Filter ``kept = 1`` for the
    deduplicated corpus; the full frame is the audit trail.

    Zero vectors (e.g. empty documents through ``hashed_embeddings``)
    have NaN cosines, and both Spark and DuckDB order NaN above every
    number — so all-zero vectors in one cell treat each other as
    duplicates and collapse to one survivor. For *identical* empty
    documents that is the right answer; filter zero vectors first if
    you want them all retained.

    ``pair_kernel`` selects the within-cell verify implementation:

    - ``"hof"`` (default): the pair dot is a higher-order fold inside
      the join condition — interpreted, but zero Python crossings and
      no second corpus join.
    - ``"arrow"``: materialize the (cell-capped) candidate pairs, dot
      them in ONE vectorized pandas_udf (64 per-dim fused
      multiply-adds across the whole Arrow batch, preserving the
      fold's left-to-right IEEE order bit-exactly), then join the
      dominated set back. Pays Arrow transfer of both unit vectors
      per pair plus one extra id-keyed join; wins when cells are fat
      (candidate pairs ≫ rows). Both kernels produce identical rows;
      a pytest pins the equality.
    """
    from .simsearch import assign_cells, take_centroids

    cents = (centroids if centroids is not None
             else take_centroids(df, n_cells, id_col, vec_col))
    assigned = assign_cells(df, cents, id_col, vec_col)
    # pre-normalize ONCE per row so the per-PAIR predicate is a single
    # dot product — higher-order array expressions are interpreted, and
    # computing two norms inside the quadratic verify was 3× the math
    # where it hurts most (norm staged as a real column first: a lambda
    # capturing the norm SUBTREE would re-evaluate it per element)
    assigned = assigned.withColumn(
        "_nrm", F.sqrt(F.aggregate(F.col("v"), F.lit(0.0),
                                   lambda acc, x: acc + x * x))
    ).withColumn(
        "u", F.transform(F.col("v"), lambda x: x / F.col("_nrm")))
    # the assigned table feeds THREE consumers (cap guard, dominating
    # side, probe side), and its interpreted-HOF assignment + norm
    # re-execute per scan without a cache (r5: measured ~2 s of the
    # entry's ~5 s). MEMORY_AND_DISK persist, handed to the caller via
    # the family's attach/release convention — at corpus scale this
    # trades one materialization against two re-derivations of the
    # interpreted assignment, and spills rather than evicts.
    assigned = assigned.persist()

    # bounded cell guard (≤ |centroids| rows, broadcast): restricting the
    # *dominating* side to under-cap cells makes every member of an
    # oversized cell matchless — retained wholesale, with no split/union
    # of the corpus
    ok = (
        assigned.groupBy("cell").agg(F.count("*").alias("_n"))
        .where(F.col("_n") <= cell_cap)
        .select("cell")
    )
    a = assigned.join(F.broadcast(ok), "cell").select(
        F.col(id_col).alias("_aid"), F.col("cell").alias("_acell"),
        F.col("csim").alias("_acsim"), F.col("u").alias("_au"))
    higher_priority = (
        (F.col("_acsim") < F.col("csim"))
        | ((F.col("_acsim") == F.col("csim"))
           & (F.col("_aid") < F.col(id_col)))
    )
    if pair_kernel == "arrow":
        # candidate pairs first (equi-join on cell + priority filter —
        # the same pair set the hof join enumerates internally), then
        # one Arrow crossing for all dots. The >= eps compare happens
        # Spark-side so NaN keeps its "above every number" semantics.
        pairs = assigned.select(id_col, "cell", "csim", "u").join(
            a, (F.col("cell") == F.col("_acell")) & higher_priority)
        dom = (pairs
               .where(F.round(_pair_dot_arrow(F.col("_au"), F.col("u")),
                              6) >= eps)
               .groupBy(id_col)
               .agg(F.count("*").alias("_ndom")))
        return _attach_persisted(
            assigned.select(id_col, "cell", "csim")
            .join(dom, id_col, "left")
            .select(id_col, "cell", "csim",
                    F.when(F.col("_ndom").isNull(), F.lit(1))
                    .otherwise(F.lit(0)).alias("kept")),
            assigned)
    if pair_kernel != "hof":
        raise ValueError(
            f"pair_kernel must be 'hof' or 'arrow', got {pair_kernel!r}")
    pair_cos = F.round(
        F.aggregate(F.zip_with(F.col("_au"), F.col("u"),
                               lambda x, y: x * y),
                    F.lit(0.0), lambda acc, x: acc + x), 6)
    cond = (
        (F.col("cell") == F.col("_acell"))
        & higher_priority
        & (pair_cos >= eps)
    )
    return _attach_persisted(
        assigned.join(a, cond, "left")
        .groupBy(id_col, "cell", "csim")
        .agg(F.count("_aid").alias("_ndom"))
        .select(id_col, "cell", "csim",
                F.when(F.col("_ndom") == 0, F.lit(1)).otherwise(F.lit(0))
                .alias("kept")),
        assigned)


# ---------------------------------------------------------------------------
# exact-substring dedup (duplicated k-token spans, Lee et al. 2022)
# ---------------------------------------------------------------------------


def _positioned_kgrams(df: DataFrame, id_col: str, text_col: str,
                       k: int) -> DataFrame:
    """(doc_id, pos, n_tok, gh): every k-token window start position
    with its gram hash, over normalized whitespace tokens."""
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(normalize_text(F.col(text_col))).alias("_t"))
    staged = staged.select(
        "doc_id", "_t", F.size("_t").alias("n_tok"))
    grams = F.when(
        F.col("n_tok") >= k,
        F.transform(
            F.sequence(F.lit(0), F.col("n_tok") - k),
            lambda i: F.concat_ws(
                " ", F.slice(F.col("_t"), (i + 1).cast("int"), k))),
    ).otherwise(F.array().cast("array<string>"))
    return (
        staged.select("doc_id", "n_tok",
                      F.posexplode(grams).alias("pos", "gram"))
        .select("doc_id", "n_tok", "pos",
                portable_hash60(F.col("gram")).alias("gh"))
    )


def exact_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Duplicated exact substrings, the span-level analogue of document
    dedup (Lee et al. 2022, arXiv:2107.06499 — "deduplicating training
    data makes language models better"): a k-token window whose exact
    (normalized) text occurs more than once ANYWHERE in the corpus —
    across documents or repeated within one — marks a duplicated span;
    overlapping marks merge. Returns ``(doc_id, start_tok, end_tok,
    span_tokens)`` with token-index spans ``[start_tok, end_tok)``.

    Suffix arrays (the paper's tool) are sequential; the distributed
    shape is sliding k-gram fingerprints: explode every window (linear
    in corpus tokens — this IS the cost of substring-level dedup),
    count occurrences per gram hash (partial-agg shuffle; hot phrases
    collapse map-side), semi-join duplicated hashes back onto the
    positioned windows (no fan-out: each window matches one hash), and
    merge per-document via a gaps-and-islands window (running max of
    span ends; per-doc partitions are bounded by document length).
    A hash collision (md5-60bit) could mark a non-duplicated span —
    vanishingly rare and only ever *over*-removes.
    """
    hits = _positioned_kgrams(df, id_col, text_col, k)
    dup = (hits.groupBy("gh").agg(F.count("*").alias("_n"))
           .where(F.col("_n") >= 2).select("gh"))
    marked = hits.join(dup, "gh", "left_semi")
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, -1))
    islanded = (
        marked
        .withColumn("_prev_end", F.max(F.col("pos") + k).over(w))
        .withColumn("_new", F.when(
            F.col("_prev_end").isNull()
            | (F.col("pos") > F.col("_prev_end")), 1).otherwise(0))
        .withColumn("_isl", F.sum("_new").over(
            Window.partitionBy("doc_id").orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        islanded.groupBy("doc_id", "_isl")
        .agg(F.min("pos").alias("start_tok"),
             (F.max("pos") + k).alias("end_tok"))
        .select("doc_id", "start_tok", "end_tok",
                (F.col("end_tok") - F.col("start_tok")).alias("span_tokens"))
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Rewrite each document with its duplicated k-token spans removed
    (every occurrence is cut — the conservative policy when spans are
    boilerplate; document-level dedup keeps one *copy of a document*,
    this removes repeated *passages*). Output ``(doc_id, n_tok,
    kept_tok, cleaned_text)`` where ``cleaned_text`` is the surviving
    normalized tokens rejoined with single spaces (normalization is
    inherent: spans were matched on normalized tokens). Documents
    shorter than ``k`` tokens pass through (normalized) unchanged.

    Same plan as :func:`exact_substring_spans` plus one per-doc window
    computing token coverage (running max of hit ends) and one ordered
    rebuild via array_sort(collect_list) — bounded by document length,
    the explode's inverse.
    """
    hits = _positioned_kgrams(df, id_col, text_col, k)
    dup = (hits.groupBy("gh").agg(F.count("*").alias("_n"))
           .where(F.col("_n") >= 2).select("gh"))
    marked = hits.join(dup, "gh", "left_semi") \
        .select("doc_id", "pos", (F.col("pos") + k).alias("hit_end"))

    toks = (
        df.select(F.col(id_col).alias("doc_id"),
                  tokens(normalize_text(F.col(text_col))).alias("_t"))
        .select("doc_id", F.size("_t").alias("n_tok"),
                F.posexplode_outer("_t").alias("pos", "tok"))
    )
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, 0))
    covered = (
        toks.join(marked, ["doc_id", "pos"], "left")
        .withColumn("_cov_end", F.max("hit_end").over(w))
        .withColumn("_covered",
                    F.col("_cov_end").isNotNull()
                    & (F.col("pos") < F.col("_cov_end")))
    )
    return (
        covered.groupBy("doc_id")
        .agg(F.max("n_tok").alias("n_tok"),
             F.sum(F.when(~F.col("_covered") & F.col("tok").isNotNull(), 1)
                   .otherwise(0)).cast("long").alias("kept_tok"),
             F.concat_ws(" ", F.transform(
                 F.array_sort(F.collect_list(
                     F.when(~F.col("_covered"),
                            F.struct("pos", "tok")))),
                 lambda s: s["tok"])).alias("cleaned_text"))
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, the MOSS
    algorithm): from every sliding window of ``w`` consecutive k-gram
    hashes, keep the minimum (rightmost on ties). Guarantee: any two
    documents sharing a span of ≥ w+k−1 tokens share at least one
    fingerprint, while the expected index density is only 2/(w+1) of
    the k-gram positions — the sampled, index-sized alternative to
    :func:`exact_substring_spans`' every-position table (pair candidate
    generation is then a fingerprint-hash join, as in LSH).

    Returns ``(doc_id, pos, gh)`` — the selected fingerprint positions.
    Plan: the positioned k-gram explode (linear in corpus tokens) plus
    ONE per-document sliding window (`rowsBetween(-(w-1), 0)` over
    pos — conversation/document-sized groups) selecting
    ``min(struct(gh, -pos))`` per frame, then a distinct on the picks.
    Documents with at least one k-gram always contribute at least one
    fingerprint: when a document has fewer than ``w`` k-grams its
    single (partial) trailing window picks the minimum over all of
    them — without this, short documents would be invisible to the
    index and could never surface as containment candidates. Documents
    with fewer than k tokens contribute nothing (whole-document
    fingerprint territory — :func:`exact_duplicates`).
    """
    if w < 1:
        raise ValueError("window w must be >= 1")
    grams = _positioned_kgrams(df, id_col, text_col, k)
    frame = (Window.partitionBy("doc_id").orderBy("pos")
             .rowsBetween(-(w - 1), 0))
    picked = grams.select(
        "doc_id",
        F.min(F.struct(F.col("gh"), (-F.col("pos")).alias("_np")))
        .over(frame).alias("_m"),
        F.col("pos").alias("_at"),
        (F.col("n_tok") - k).alias("_maxpos"),
    ).where(F.col("_at") >= F.least(F.lit(w - 1), F.col("_maxpos")))
    return (
        picked.select("doc_id", (-F.col("_m._np")).alias("pos"),
                      F.col("_m.gh").alias("gh"))
        .dropDuplicates()
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    k: int = 8,
    bands: int = 4,
    n: int = 3,
    bucket_cap: int = 1000,
) -> DataFrame:
    """Two-table fuzzy record linkage — the A×B sibling of the self-join
    dedup family: link every left row to the right rows whose normalized
    text is near-duplicate (word-``n``-gram Jaccard ≥ ``threshold``),
    without ever comparing all |A|×|B| pairs. The classic entity/record
    matching shape (catalog reconciliation, incoming-batch vs master).

    Candidates come from the SAME banded MinHash scheme both tables are
    sketched with (identical hash family, so a shared band key means a
    probable match); each (band, key) bucket joins left×right members
    with a per-bucket cap on each side (degenerate buckets — empty or
    boilerplate text — are dropped and bounded exactly like
    ``minhash_lsh_pairs``); candidates dedupe on the pair, then
    :func:`jaccard_pairs` verifies on the union of both tables. Returns
    ``(id_left, id_right, jaccard)``.

    Ids must be unique across BOTH tables for the verify join (by
    contract — prefix them if the keyspaces overlap). Persisted band
    tables ride on the result for :func:`release`.
    """
    lb = minhash_band_table(left, id_col, text_col, k, bands).persist()
    rb = minhash_band_table(right, id_col, text_col, k, bands).persist()

    def capped(bt):
        sizes = (bt.groupBy("band", "band_key")
                 .agg(F.count("*").alias("_n"))
                 .where(F.col("_n") <= bucket_cap)
                 .select("band", "band_key"))
        return bt.join(sizes, ["band", "band_key"], "left_semi")

    cand = (
        capped(lb).withColumnRenamed("doc_id", "id_left")
        .join(capped(rb).withColumnRenamed("doc_id", "id_right"),
              ["band", "band_key"])
        .select("id_left", "id_right")
        .dropDuplicates()
    )
    both = left.select(F.col(id_col), F.col(text_col)).unionByName(
        right.select(F.col(id_col), F.col(text_col)))
    pairs = cand.select(F.col("id_left").alias("id_a"),
                        F.col("id_right").alias("id_b"))
    verified = jaccard_pairs(both, pairs, id_col, text_col, n, threshold)
    out = verified.select(F.col("id_a").alias("id_left"),
                          F.col("id_b").alias("id_right"), "jaccard")
    return _attach_persisted(out, lb, rb)


def edit_distance_verify(
    pairs: DataFrame,
    max_dist: int = 2,
    id_a: str = "id_a",
    id_b: str = "id_b",
    s_a: str = "s_a",
    s_b: str = "s_b",
) -> DataFrame:
    """Edit-distance verification of candidate pairs — the exact-match
    stage between a blocker (:func:`~cow_spark.plans.parity.
    sorted_neighborhood`, :func:`fuzzy_join`'s bands) and the decision
    layer (:func:`~cow_spark.plans.parity.fs_weights`): keep pairs
    whose strings are within ``max_dist`` Levenshtein edits.

    Scale shape: a length pre-filter (``|len_a − len_b| > k`` cannot
    be within k edits) prunes before any O(n·m) work, then Spark's
    THRESHOLD-BANDED ``levenshtein(l, r, k)`` computes only the
    diagonal band (returns −1 when the distance exceeds k — the
    standard Ukkonen cutoff, JVM-side). Map-only over the candidate
    table: whatever the blocker's volume discipline bought is
    preserved. Unit-cost edits on codepoints in both engines.

    Returns ``(id_a, id_b, dist)``, dist ∈ [0, max_dist].
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    p = pairs.select(
        F.col(id_a).alias("id_a"), F.col(id_b).alias("id_b"),
        F.col(s_a).cast("string").alias("sa"),
        F.col(s_b).cast("string").alias("sb"))
    pre = p.where(
        F.col("sa").isNotNull() & F.col("sb").isNotNull()
        & (F.abs(F.length("sa") - F.length("sb")) <= max_dist))
    d = F.levenshtein(F.col("sa"), F.col("sb"), max_dist)
    return (pre.withColumn("dist", d)
            .where((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
            .select("id_a", "id_b", F.col("dist").cast("int")))


def edit_distance_verify_oracle_sql(pairs_cte: str,
                                    max_dist: int = 2) -> str:
    """DuckDB twin of :func:`edit_distance_verify` (full levenshtein +
    filter — DuckDB lacks the threshold cutoff; same result set).

    **ASCII-only fixtures**: DuckDB's ``levenshtein`` counts BYTES
    ('résumé' vs 'resume' = 4) while Spark's counts codepoints (= 2).
    The operator's codepoint semantics are the correct ones; the twin
    is exact only where bytes == codepoints, so oracle-facing fixtures
    stay ASCII (pinned in tests) — the same symmetric-fixture rule as
    the tokenizer's ``\\s`` gap."""
    return f"""
with p as (
  select id_a, id_b, cast(s_a as varchar) as sa,
         cast(s_b as varchar) as sb
  from ({pairs_cte})
)
select id_a, id_b, cast(levenshtein(sa, sb) as int) as dist
from p
where sa is not null and sb is not null
  and abs(length(sa) - length(sb)) <= {max_dist}
  and levenshtein(sa, sb) <= {max_dist}
"""


def set_similarity_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """EXACT Jaccard-threshold self-join via prefix filtering — the
    AllPairs/PPJoin family (Bayardo et al. WWW'07, Xiao et al. WWW'08)
    re-expressed as DataFrame ops. MinHash-LSH (:func:`minhash_lsh_pairs`)
    is probabilistic: it misses pairs (false negatives) and its recall
    depends on band geometry. This operator returns EVERY pair with
    word-``n``-gram Jaccard >= ``threshold`` — the guarantee a
    contamination audit or a legal-dedup pass needs — while still never
    comparing all |D|² pairs.

    Pruning stack (each sound — over-generation only, verified exactly):
    1. **Global rarity order**: shingles ranked by ascending document
       frequency; each doc's shingle list is sorted by that rank.
    2. **Prefix filter**: two sets with J >= t MUST share an element in
       their first ``|S| - ceil(t·|S|) + 1`` rarity-sorted shingles, so
       candidates come from a self-join on *prefix* shingles only —
       and prefixes are dominated by RARE shingles, so bucket sizes stay
       small where frequency is high (the skew-killer built into the
       algorithm).
    3. **Size filter**: J >= t implies min(|A|,|B|) >= t·max(|A|,|B|).
    4. **Positional filter** (PPJoin): at the first shared prefix
       element (positions i, j), overlap is bounded by
       ``1 + min(|A|-i, |B|-j)``; prune when that cannot reach
       ``ceil(t/(1+t)·(|A|+|B|))``.
    Float guards subtract 1e-9 before ceil/compare so IEEE noise can
    only over-generate, never drop a true pair. The verify stage is
    integer-exact: ``inter·1e6 >= round(t·1e6)·union``.

    Scale shape: one explode (corpus → shingles), one vocabulary-sized
    global rank (same family as BPE's merge table), one per-doc window
    sort, a prefix-bucket self-join (bounded by rarity ordering), exact
    verify on the pair-participant subset only. No driver collects, no
    unblocked n².

    Returns ``(id_a, id_b, jaccard_ppm)`` with jaccard_ppm an exact
    integer ``(inter·1e6) // union`` (pmod floor trick — double
    division ulp must not flip the floor at exact quotients).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    thr_ppm = round(threshold * 1_000_000)
    eps = 1e-9

    # Everything flows through ONE exploded (doc, shingle) table — the
    # minhash-proven shape. Materializing the shingle ARRAY first is a
    # trap: the physical planner inlines the token expression into the
    # interpreted shingle lambda (no cache/Generate boundary), and the
    # per-element re-eval of tokenization costs 13 s at sf0.1 for a
    # stage that is 0.2 s behind the explode boundary used here.
    toks = df.select(F.col(id_col).alias("doc_id"),
                     tokens(normalize_text(F.col(text_col))).alias("_tok"))
    ex0 = toks.select(
        "doc_id",
        F.explode(shingles_from_tokens(F.col("_tok"), n)).alias("g"))
    # |S| per doc via window over the same partitioning the rank window
    # reuses below — distinct shingles, so sz = row count
    ex = ex0.withColumn(
        "sz", F.count("*").over(Window.partitionBy("doc_id")))
    # feeds rarity ranking, prefix generation AND the exact verify
    # join — persist once, release via dedup.release()
    ex = ex.persist()
    # global rarity order: ascending document frequency, shingle string
    # as the deterministic tiebreak. The (df, g) KEY itself is the rank
    # — no densified integer, so no single-partition global row_number
    # over the vocabulary; per-doc positions come from a doc-keyed
    # window and the prefix self-join keys on the shingle directly.
    dfreq = ex.groupBy("g").count()
    ranked = ex.join(dfreq, "g").select("doc_id", "sz", "g", "count")
    pos = F.row_number().over(
        Window.partitionBy("doc_id")
        .orderBy(F.col("count").asc(), F.col("g").asc()))
    # prefix length |S| - ceil(t|S|) + 1 (eps: ceil must not round a
    # float hair ABOVE the true rational up an extra step = lost pairs)
    plen = (F.col("sz")
            - F.ceil(F.lit(threshold) * F.col("sz") - F.lit(eps)) + 1)
    pref = (ranked.withColumn("pos", pos)
            .where(F.col("pos") <= plen)
            .select("doc_id", "sz", "g", "pos"))

    a, b = pref.alias("a"), pref.alias("b")
    alpha = F.ceil(F.lit(threshold / (1.0 + threshold))
                   * (F.col("a.sz") + F.col("b.sz")) - F.lit(eps))
    ubound = 1 + F.least(F.col("a.sz") - F.col("a.pos"),
                         F.col("b.sz") - F.col("b.pos"))
    cand = (
        a.join(b, F.col("a.g") == F.col("b.g"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .where(F.least("a.sz", "b.sz").cast("double")
               >= F.lit(threshold) * F.greatest("a.sz", "b.sz") - F.lit(eps))
        .where(ubound >= alpha)
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"))
        .distinct()
    )

    # exact verify without materializing shingle arrays: intersection
    # size = matched-row count of a (pair × shingles) equi-join on the
    # exploded table — whole-stage codegen end to end, and bounded by
    # |cand| × |S_a| (the candidate set, not the corpus)
    m = (cand
         .join(ex.select(F.col("doc_id").alias("id_a"), "g",
                         F.col("sz").alias("sz_a")), "id_a")
         .join(ex.select(F.col("doc_id").alias("id_b"), "g",
                         F.col("sz").alias("sz_b")), ["id_b", "g"]))
    v = (m.groupBy("id_a", "id_b", "sz_a", "sz_b")
         .agg(F.count("*").alias("inter")))
    union = (F.col("sz_a") + F.col("sz_b")).cast("long") - F.col("inter")
    num = F.col("inter").cast("long") * F.lit(1_000_000)
    jac_ppm = ((num - F.pmod(num, union)) / union).cast("long")
    out = (v.where(num >= F.lit(thr_ppm) * union)
           .select("id_a", "id_b", jac_ppm.alias("jaccard_ppm")))
    return _attach_persisted(out, ex)


# ---------------------------------------------------------------------------
# survivor selection (dedup completion: which member of each group ships)
# ---------------------------------------------------------------------------


def select_survivors(
    docs: DataFrame,
    group_col: str = "group_id",
    id_col: str = "doc_id",
    score_col: str = "score",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Canonical-document selection — the step that completes every
    dedup pass: each duplicate group keeps exactly ONE member, and
    which one matters (CCNet/RefinedWeb keep the highest-quality
    copy, not an arbitrary one, because boilerplate mirrors often
    outnumber the clean original). Input is the per-member table
    ``(group, id, score, tokens)`` — the join of any grouping
    operator here (:func:`near_duplicate_groups`, :func:`semdedup`,
    URL dedup) with any scorer (:mod:`~cow_spark.operators.quality`).

    Survivor = max score, ties broken by min id (fully deterministic:
    the pick replays under any partitioning). Implemented as ONE
    partial-aggregable ``min(struct(-score, id, tokens))`` — the
    argmax rides the same map-side combine as the counts, so a
    billion-member table costs a single group-sized shuffle and no
    window sort. Returns ``(group, survivor_id, survivor_score,
    n_members, kept_tokens, dropped_tokens)``; ``dropped_tokens``
    summed over a corpus is the dedup savings headline.

    No reference counterpart (COW ships every row); extension family
    SURVEY.md §2.11.
    """
    g = F.col(group_col)
    pick = F.min(F.struct(
        (-F.col(score_col).cast("long")).alias("ns"),
        F.col(id_col).alias("id"),
        F.col(tokens_col).cast("long").alias("tok")))
    return (docs
            .where(g.isNotNull() & F.col(id_col).isNotNull())
            .groupBy(g.alias("group_id"))
            .agg(F.count("*").cast("long").alias("n_members"),
                 F.sum(F.col(tokens_col).cast("long")).alias("_tot"),
                 pick.alias("_s"))
            .select("group_id",
                    F.col("_s.id").alias("survivor_id"),
                    (-F.col("_s.ns")).cast("long").alias("survivor_score"),
                    "n_members",
                    F.col("_s.tok").alias("kept_tokens"),
                    (F.col("_tot") - F.col("_s.tok")).cast("long")
                    .alias("dropped_tokens")))


def select_survivors_oracle_sql(members_sql: str) -> str:
    """DuckDB twin of :func:`select_survivors`. ``members_sql`` must
    yield (group_id, doc_id, score, n_tokens). Same rule spelled as a
    window: rank by (score desc, doc_id asc), keep rank 1."""
    return f"""
with m as materialized (
  select group_id, doc_id, cast(score as bigint) as score,
         cast(n_tokens as bigint) as n_tokens
  from ({members_sql})
  where group_id is not null and doc_id is not null),
r as (
  select *, row_number() over (
    partition by group_id order by score desc, doc_id) as rn,
    cast(count(*) over (partition by group_id) as bigint) as n_members,
    cast(sum(n_tokens) over (partition by group_id) as bigint) as tot
  from m)
select group_id, doc_id as survivor_id, score as survivor_score,
       n_members, n_tokens as kept_tokens,
       cast(tot - n_tokens as bigint) as dropped_tokens
from r where rn = 1
"""


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    divisor: int = 64,
) -> DataFrame:
    """Content-defined chunking: split every document at positions
    where a hash of the trailing ``window`` characters ≡ 0 (mod
    ``divisor``) — boundaries move WITH the content, so an insertion
    near the top of a near-identical document shifts every byte
    offset but almost no chunk boundary, and the shared tail chunks
    hash equal. That is the storage/transfer dedup primitive
    (rsync/LBFS/restic lineage) the fixed-shingle family can't give:
    :func:`exact_duplicates` needs whole-doc equality,
    :func:`substring_dedup` fixed-stride windows pay per-offset.
    Expected chunk length ≈ ``divisor`` chars.

    Deviation from classic gear-hash CDC, stated loudly: (a) the
    boundary test hashes an explicit ``window``-char substring with
    the portable md5 (engine-replayable; a rolling gear hash is the
    same decision rule computed incrementally — swap in at 100 TB if
    the md5 constant factor bites), and (b) there is NO min/max chunk
    clamp — a clamp makes boundary k depend on boundary k−1
    (sequential, unsplittable); unclamped, every boundary is a pure
    local predicate and the whole pass is embarrassingly parallel.
    Degenerate runs (e.g. one repeated char) therefore yield either
    no boundaries or a boundary at every position — both bounded by
    doc length, neither wrong.

    Scale shape: one position-explode (corpus-char-sized, the honest
    CDC cost, O(window) work per position) → boundary filter (~1/
    ``divisor`` survives) → per-doc sorted boundary array (doc-
    bounded) → one doc-keyed join back to rebuild chunk spans. The
    aggregation boundary stages the array for the span lambda (no
    re-inlined HOF subtree). Returns ``(doc_id, chunk_idx, lo_char,
    n_chars, chunk_hash)`` — 1-based ``lo_char``; empty/NULL text
    yields no rows; cross-doc sharing is one groupBy on
    ``chunk_hash`` downstream.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    if window < 2 or divisor < 2:
        raise ValueError(
            f"cdc_chunks: window >= 2 and divisor >= 2 required, got "
            f"{window}/{divisor}")
    from ..functions.hashing import portable_hash32

    base = (df.select(F.col(id_col).alias("doc_id"),
                      F.col(text_col).alias("t"))
            .where(F.col(text_col).isNotNull()
                   & (F.length(text_col) >= 1))
            .withColumn("n", F.length("t").cast("long")))
    # Spark sequence(a, b) DESCENDS when b < a (CLAUDE.md gotcha) —
    # guard the empty-candidate case explicitly
    cand = F.when(F.col("n") - 1 >= window,
                  F.sequence(F.lit(window).cast("long"),
                             F.col("n") - 1)
                  ).otherwise(F.array().cast("array<long>"))
    pos = (base.select("doc_id", "t", F.explode(cand).alias("i"))
           .where(F.pmod(
               portable_hash32(F.expr(
                   f"substring(t, cast(i as int) - {window - 1}, "
                   f"{window})")),
               F.lit(divisor)) == 0)
           .groupBy("doc_id")
           .agg(F.array_sort(F.collect_list("i")).alias("bs")))
    spans = (base.join(pos, "doc_id", "left")
             .withColumn("f", F.expr(
                 "concat(array(0L), coalesce(bs, array()), array(n))"))
             .select("doc_id", "t", F.posexplode(F.expr(
                 "transform(sequence(0, size(f) - 2), "
                 "j -> struct(f[j] + 1 as lo, f[j + 1] as hi))"))
                 .alias("chunk_idx", "s"))
             .where(F.col("s.hi") >= F.col("s.lo")))
    chunk = F.expr("substring(t, cast(s.lo as int), "
                   "cast(s.hi - s.lo + 1 as int))")
    return spans.select(
        "doc_id", F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("s.lo").cast("long").alias("lo_char"),
        (F.col("s.hi") - F.col("s.lo") + 1).cast("long")
        .alias("n_chars"),
        portable_hash60(chunk).alias("chunk_hash"))


def cdc_chunks_oracle_sql(docs_sql: str, window: int = 16,
                          divisor: int = 64) -> str:
    """DuckDB twin of :func:`cdc_chunks`; ``docs_sql`` yields
    ``(doc_id, text)``. generate_series(a, b) with b < a is EMPTY in
    DuckDB (no descending trap), so no guard is needed."""
    from ..functions.hashing import (portable_hash32_sql,
                                     portable_hash60_sql)

    h32 = portable_hash32_sql(
        f"substr(t, cast(i as int) - {window - 1}, {window})")
    h60 = portable_hash60_sql(
        "substr(t, cast(lo as int), cast(hi - lo + 1 as int))")
    return f"""
with base as materialized (
  select doc_id, text as t, cast(length(text) as bigint) as n
  from ({docs_sql})
  where text is not null and length(text) >= 1),
pos as (
  select doc_id, unnest(generate_series({window}, n - 1)) as i
  from base),
bnd as (
  select p.doc_id, p.i
  from pos p join base using (doc_id)
  where {h32} % {divisor} = 0),
bs as (
  select doc_id, list_sort(list(i)) as bs from bnd group by doc_id),
spans as (
  select base.doc_id, t,
         list_concat(list_concat([cast(0 as bigint)],
                     coalesce(bs, [])), [n]) as f
  from base left join bs using (doc_id)),
chunks as (
  select doc_id, t, j as chunk_idx,
         f[j + 1] + 1 as lo, f[j + 2] as hi
  from spans, lateral (select unnest(generate_series(0, len(f) - 2))
                       as j) g
  where f[j + 2] >= f[j + 1] + 1)
select doc_id, cast(chunk_idx as int) as chunk_idx,
       cast(lo as bigint) as lo_char,
       cast(hi - lo + 1 as bigint) as n_chars,
       {h60} as chunk_hash
from chunks
"""
