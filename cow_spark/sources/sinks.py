"""Sinks (SURVEY.md S7/S9): quad tables + N-Quads text.

Primary sink is a bucketed Parquet quads table (the offline-sandbox
stand-in for an Iceberg table partitioned by ``bucket(N, ...)``); the
N-Quads text sink reproduces the reference's .nq[.gz] output
(src/converter/csvw.py:366-374, gzip :199-203).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import QUAD_COLS, to_nquads_lines


_TABLE_FORMATS = ("parquet", "orc")  # built-in columnar scans with
# predicate pushdown + partition pruning; avro/iceberg need jars the
# offline sandbox lacks (see write_quads_iceberg's gate)


def write_quads_table(
    quads: DataFrame,
    path: str,
    n_buckets: int = 64,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Quads → columnar table (parquet or orc) partitioned by a stable
    subject-hash bucket.

    Bucketing by hash(s) keeps each entity's triples co-located (point
    lookups prune to one directory) and spreads hot subjects' *files*
    evenly — at 100 TB the partition count stays fixed at n_buckets
    regardless of data volume, with many files per bucket.
    """
    if fmt not in _TABLE_FORMATS:
        raise ValueError(
            f"unsupported table format {fmt!r}; use one of {_TABLE_FORMATS}")
    (
        quads.withColumn(
            "s_bucket", F.pmod(F.xxhash64(F.col("s")), F.lit(n_buckets)).cast("int")
        )
        .write.mode(mode)
        .partitionBy("s_bucket")
        .format(fmt).save(path)
    )


def read_quads_table(spark: SparkSession, path: str,
                     fmt: str = "parquet") -> DataFrame:
    if fmt not in _TABLE_FORMATS:
        raise ValueError(
            f"unsupported table format {fmt!r}; use one of {_TABLE_FORMATS}")
    return spark.read.format(fmt).load(path).select(*QUAD_COLS)


def compact_quads_table(
    spark: SparkSession,
    path: str,
    n_buckets: int = 64,
) -> int:
    """Globally dedup and rewrite a quads table — the batch compaction
    the streaming sinks defer exact dedup to (streaming can only dedup
    within the watermark horizon; duplicates farther apart than the
    lateness bound survive until this runs). On Iceberg this is a MERGE
    / rewrite-data-files action; the Parquet fallback stages the
    deduped rewrite next to the table and swaps directories on the
    driver. Returns the number of duplicate quads removed.
    """
    import os
    import shutil

    staged = path.rstrip("/") + ".compact"
    old = path.rstrip("/") + ".old"
    # leftovers from a previous crashed compaction must not swallow the
    # new table (shutil.move nests into an existing directory)
    for leftover in (staged, old):
        if os.path.exists(leftover):
            shutil.rmtree(leftover)
    quads = read_quads_table(spark, path)
    before = quads.count()
    deduped = quads.dropDuplicates(QUAD_COLS)
    write_quads_table(deduped, staged, n_buckets=n_buckets)
    after = spark.read.parquet(staged).count()
    # narrow non-atomic window (two renames); roll back if the second
    # move fails so the table never stays missing — on Iceberg this
    # whole swap is a transactional commit instead
    shutil.move(path, old)
    try:
        shutil.move(staged, path)
    except BaseException:
        shutil.move(old, path)
        raise
    shutil.rmtree(old)
    return before - after


def write_quads_iceberg(
    quads: DataFrame,
    table: str = "cow.kg.quads",
    n_buckets: int = 64,
    mode: str = "append",
) -> None:
    """Primary production sink: Iceberg table partitioned by a real
    ``bucket(N, s)`` transform (north_rule: explicit partitioning +
    snapshot lineage). Requires the Iceberg Spark runtime jar and a
    session built with ``get_session(iceberg_warehouse=...)``; this
    offline sandbox has neither, so :func:`write_quads_table` (bucketed
    Parquet) is the tested fallback with the same physical layout.
    """
    from pyspark.sql.functions import bucket, col

    from ..session import iceberg_available

    if not iceberg_available():
        raise NotImplementedError(
            "Iceberg runtime jar not on the classpath (offline sandbox). "
            "Use write_quads_table (bucketed Parquet fallback), or on a "
            "cluster submit with --packages org.apache.iceberg:"
            "iceberg-spark-runtime-<spark>_<scala>:<version> and build "
            "the session via get_session(iceberg_warehouse=...)."
        )
    w = quads.writeTo(table).partitionedBy(bucket(n_buckets, col("s")))
    if mode == "overwrite":
        w.createOrReplace()
    elif quads.sparkSession.catalog.tableExists(table):
        # append errors (schema drift, commit conflicts) must surface
        # as-is — never masked by a doomed create attempt
        w.append()
    else:
        w.create()


RDF_TEXT_FORMATS = ("nquads", "nt", "ntriples", "turtle", "ttl", "n3",
                    "trig")
RDF_XML_FORMATS = ("xml", "pretty-xml", "trix")


def write_rdf(
    quads: DataFrame,
    path: str,
    fmt: str = "nquads",
    graph: str | None = None,
    gzip: bool = False,
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """S8 — serialize quads to an RDF text format.

    The reference transcodes by re-parsing its .nq through rdflib
    (csvw_tool.py:61-78); we emit each format directly from the term
    renderer using *correct subsets* of the grammars:

    - ``nquads``             — full named-graph output (the default)
    - ``nt``/``ntriples``    — graph column dropped (triples only)
    - ``turtle``/``ttl``     — N-Triples IS valid Turtle; no prefix
      compaction (prefixes are cosmetic, the document is conformant)
    - ``n3``                 — Turtle is a subset of Notation3, so the
      turtle emission is a conformant N3 document as-is
    - ``trig``               — one ``<graph> { ... }`` block per graph
      (default-graph triples emitted bare), distributed per-graph
    - ``xml``/``pretty-xml``/``trix`` — single XML document streamed
      through the driver (:mod:`.xmlser`; one root element ⇒ inherently
      single-writer, like the reference's rdflib transcode — but
      streaming, not whole-graph-in-RAM). ``path`` is the file itself,
      not a part directory.
    """
    from ..model import triple_line

    f = fmt.lower()
    if f in RDF_XML_FORMATS:
        from .xmlser import write_rdf_xml, write_trix

        if f == "trix":
            return write_trix(quads, path, graph=graph, gzip_out=gzip)
        return write_rdf_xml(quads, path, gzip_out=gzip,
                             pretty=(f == "pretty-xml"))
    if f not in RDF_TEXT_FORMATS:
        raise ValueError(
            f"unsupported RDF format {fmt!r}; supported: "
            f"{RDF_TEXT_FORMATS + RDF_XML_FORMATS}")
    if f == "nquads":
        return write_nquads(quads, path, graph=graph, gzip=gzip, mode=mode,
                            single_file=single_file)

    # one shared term renderer (model.triple_line) keeps every text
    # serialization's escaping identical by construction
    triple = F.concat(triple_line(quads), F.lit(" ."))
    if f in ("nt", "ntriples", "turtle", "ttl", "n3"):
        lines = quads.select(triple.alias("value")).dropDuplicates()
    else:  # trig: group triples into graph blocks
        g = quads["g"] if "g" in quads.columns else F.lit(None).cast("string")
        if graph is not None:
            g = F.coalesce(g, F.lit(graph))
        # TriG permits repeating a graph label across blocks (triples
        # union), so group per (graph, task partition) — block size stays
        # bounded by the partition instead of one giant row holding the
        # whole assertion graph
        per_graph = (
            quads.select(g.alias("_g"), triple.alias("_t"))
            .dropDuplicates()
            .groupBy("_g", F.spark_partition_id().alias("_pid"))
            .agg(F.concat_ws("\n", F.sort_array(F.collect_list("_t")))
                 .alias("_body"))
        )
        lines = per_graph.select(
            F.when(
                F.col("_g").isNotNull(),
                F.concat(F.lit("<"), F.col("_g"), F.lit("> {\n"),
                         F.col("_body"), F.lit("\n}")),
            ).otherwise(F.col("_body")).alias("value")
        )
    if single_file:
        lines = lines.coalesce(1)
    w = lines.write.mode(mode)
    if gzip:
        w = w.option("compression", "gzip")
    w.text(path)


def write_nquads(
    quads: DataFrame,
    path: str,
    graph: str | None = None,
    gzip: bool = False,
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """Quads → N-Quads text directory (optionally gzip, ≅ S9).

    ``single_file`` coalesces to one part — only for small parity
    fixtures; the distributed sink has no single-writer bottleneck
    (unlike the reference's ordered parent-process write, csvw.py:421-422).
    """
    lines = to_nquads_lines(quads, graph=graph)
    if single_file:
        lines = lines.coalesce(1)
    w = lines.write.mode(mode)
    if gzip:
        w = w.option("compression", "gzip")
    w.text(path)


def encode_quads(quads: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Dictionary-encode a quad table for storage/shuffle efficiency:
    every IRI (subjects, predicates, IRI objects) becomes a 60-bit
    portable hash id, and the string itself lives once in a ``terms``
    dictionary. Returns ``(encoded, terms)`` where ``encoded`` has
    ``(g, s_id, p_id, o_kind, o_id, o_lex, o_dt, o_lang)`` — o_id for
    IRI objects, o_lex for literals — and ``terms`` is
    ``(term_id, term)``.

    Iterative graph algorithms (CC, PageRank, path closure) and BGP
    joins shuffle fixed-width bigints instead of 50-100-byte IRIs —
    the payload shrinks ~10-50× and comparisons become integer. The
    id is content-hashed (md5-60bit, engine-portable), so encoding is
    deterministic, needs no coordination, and two tables encoded
    separately share ids — joins across independently-encoded tables
    just work. Collision odds at 60 bits are ~n²/2⁶¹ (≈1e-7 at a
    billion distinct terms); :func:`decode_quads` joins by id, so a
    collision would surface as one wrong IRI string, not silent data
    loss — checksum the dictionary (count == distinct count) where
    that matters.
    """
    from ..functions.hashing import portable_hash60

    iri_terms = (
        quads.select(F.col("s").alias("term"))
        .unionByName(quads.select(F.col("p").alias("term")))
        .unionByName(quads.where(F.col("o_kind") == "iri")
                     .select(F.col("o_lex").alias("term")))
        .dropDuplicates()
    )
    terms = iri_terms.select(
        portable_hash60(F.col("term")).alias("term_id"), "term")
    enc = quads.select(
        "g",
        portable_hash60(F.col("s")).alias("s_id"),
        portable_hash60(F.col("p")).alias("p_id"),
        "o_kind",
        F.when(F.col("o_kind") == "iri",
               portable_hash60(F.col("o_lex"))).alias("o_id"),
        F.when(F.col("o_kind") != "iri", F.col("o_lex")).alias("o_lex"),
        "o_dt", "o_lang")
    return enc, terms


def decode_quads(encoded: DataFrame, terms: DataFrame) -> DataFrame:
    """Inverse of :func:`encode_quads`: joins the dictionary back onto
    the id columns and restores the engine's quad schema. The
    dictionary is vocabulary-sized — broadcast it when it fits (the
    common case: distinct IRIs ≪ quads)."""
    t = terms.select(F.col("term_id"), F.col("term"))
    out = (
        encoded
        .join(t.withColumnRenamed("term_id", "s_id")
              .withColumnRenamed("term", "_s"), "s_id")
        .join(t.withColumnRenamed("term_id", "p_id")
              .withColumnRenamed("term", "_p"), "p_id")
        .join(t.withColumnRenamed("term_id", "o_id")
              .withColumnRenamed("term", "_o"), "o_id", "left")
        .select(
            "g", F.col("_s").alias("s"), F.col("_p").alias("p"),
            "o_kind",
            F.coalesce(F.col("_o"), F.col("o_lex")).alias("o_lex"),
            "o_dt", "o_lang")
    )
    return out.select(*QUAD_COLS)


def diff_quads(old: DataFrame, new: DataFrame) -> DataFrame:
    """Changeset between two quad-table versions: every quad tagged
    ``added`` (in new, not old) or ``removed`` (in old, not new) —
    multiset semantics via ``exceptAll``, so a duplicate count change
    surfaces too. The KG-versioning primitive: publish deltas instead
    of full dumps, audit what a re-extraction changed, feed incremental
    downstream indexes.

    One explode-free plan: two anti-semi-difference shuffles on the
    full quad key and a union of the two (already-disjoint) branches —
    the branches derive from different inputs, so the no-CSE-across-
    union rule costs nothing here.
    """
    # intersect with BOTH sides: a quad column present in only one
    # frame must not be silently excluded from the comparison (nor make
    # the other side's select raise) — that's a schema mismatch the
    # caller needs to hear about
    cols = [c for c in QUAD_COLS if c in old.columns and c in new.columns]
    only_old = [c for c in QUAD_COLS if c in old.columns and c not in new.columns]
    only_new = [c for c in QUAD_COLS if c in new.columns and c not in old.columns]
    if only_old or only_new:
        raise ValueError(
            f"diff_quads: quad-column mismatch — only in old: {only_old}, "
            f"only in new: {only_new}; align the schemas before diffing")
    o = old.select(*cols)
    n = new.select(*cols)
    added = n.exceptAll(o).withColumn("change", F.lit("added"))
    removed = o.exceptAll(n).withColumn("change", F.lit("removed"))
    return added.unionByName(removed)


def apply_changeset(old: DataFrame, changes: DataFrame) -> DataFrame:
    """Inverse of :func:`diff_quads`: roll a quad-table version forward
    by a changeset — ``apply_changeset(old, diff_quads(old, new))``
    reproduces ``new`` as a multiset (pinned by a pytest). Completes
    the CDC loop: publish deltas, and any holder of version k plus the
    delta stream reconstructs version k+1 without a full dump.

    Multiset semantics throughout (matching ``diff_quads``'s
    ``exceptAll``): removals subtract ONE occurrence per removed row,
    additions append. A removal that matches nothing in ``old`` is a
    consistency error in the delta stream and fails loudly rather than
    silently no-opping — changesets are positional facts, not hints.

    Plan: one ``exceptAll`` shuffle (removals) + a union with the
    additions; the validation count rides the same removals frame.
    """
    cols = [c for c in QUAD_COLS if c in old.columns]
    missing = [c for c in cols + ["change"] if c not in changes.columns]
    if missing:
        raise ValueError(
            f"apply_changeset: changeset lacks columns {missing}")
    bad = changes.where(~F.col("change").isin("added", "removed"))
    n_bad = bad.limit(1).count()
    if n_bad:
        raise ValueError(
            "apply_changeset: change values must be 'added'/'removed', "
            f"got {bad.first()['change']!r}")
    o = old.select(*cols)
    rem = changes.where(F.col("change") == "removed").select(*cols)
    add = changes.where(F.col("change") == "added").select(*cols)
    survivors = o.exceptAll(rem)
    # loud consistency check: every removal must have matched — compare
    # multiset sizes (cheap: two counts on already-needed frames)
    n_old, n_rem, n_surv = o.count(), rem.count(), survivors.count()
    if n_surv != n_old - n_rem:
        raise ValueError(
            f"apply_changeset: {n_old - n_surv} of {n_rem} removals "
            "matched old — the changeset does not apply to this version")
    return survivors.unionByName(add)


def history_intervals(changes: DataFrame) -> DataFrame:
    """Quad-level CDC event log → validity intervals: ``changes``
    carries the quad columns plus ``change`` ('added' | 'removed') and
    ``ts_us`` (event time, long micros); each 'added' opens an
    interval closed by the NEXT event on the same quad (NULL = still
    live). The temporal complement of :func:`diff_quads` /
    :func:`apply_changeset` — a changeset history becomes an
    SCD2-style bitemporal quad table, ready for point-in-time reads.

    Events per quad must alternate added/removed starting with
    'added' (a CDC log that double-adds is corrupt); violations fail
    loudly with a sample offender instead of silently mispairing.
    One window per quad key ordered by ``ts_us`` does both the
    validation lag and the closing lead — a single keyed sort.
    """
    from pyspark.sql import Window

    key = [F.col(c) for c in QUAD_COLS]
    # tiebreaker: equal-ts events on one quad order 'added' before
    # 'removed' (lexicographic), so an add+remove at the same instant
    # deterministically yields a zero-length interval, and duplicate
    # same-change events deterministically trip the alternation check
    # instead of passing or failing by partition luck
    w = Window.partitionBy(*key).orderBy("ts_us", "change")
    marked = changes.withColumn("_prev", F.lag("change").over(w))
    bad = (marked.where(
        (F.col("change") == F.col("_prev"))
        | (F.col("_prev").isNull() & (F.col("change") == "removed")))
        .limit(1).collect())
    if bad:
        r = bad[0]
        raise ValueError(
            "history_intervals: non-alternating change sequence for "
            f"quad (s={r['s']!r}, p={r['p']!r}, o_lex={r['o_lex']!r}) "
            f"at ts_us={r['ts_us']} (change={r['change']!r} after "
            f"{r['_prev']!r}) — the CDC log is corrupt")
    return (marked.withColumn("_next_ts", F.lead("ts_us").over(w))
            .where(F.col("change") == "added")
            .select(*QUAD_COLS,
                    F.col("ts_us").alias("valid_from_us"),
                    F.col("_next_ts").alias("valid_to_us")))


def snapshot_at(intervals: DataFrame, t_us: int) -> DataFrame:
    """Point-in-time read over :func:`history_intervals` output: the
    quads whose validity interval covers ``t_us`` (half-open
    [from, to), NULL to = still live). A pure filter — pushed to the
    interval table's scan, partition-prunable when the table is laid
    out by valid_from."""
    return (intervals.where(
        (F.col("valid_from_us") <= F.lit(t_us))
        & (F.col("valid_to_us").isNull()
           | (F.col("valid_to_us") > F.lit(t_us))))
        .select(*QUAD_COLS))
