"""E7/A3 — nanopublication provenance, generalized to per-partition graphs.

The reference wraps each conversion in ONE nanopublication: four named
graphs (nanopub spine / assertion / provenance / pubinfo) minted under
``{base}/{name}/{kind}/{short_sha1}/{timestamp}`` plus a dataset-version
node carrying the source path and a git-blob-compatible sha1
(src/converter/util/__init__.py:148-248, 64-83).

We generalize to **one nanopub per partition** of the job (north_star:
"per-partition nanopub-style provenance graphs with lineage + metrics"):
the spine + run-level provenance stays a tiny driver-built DataFrame; the
per-partition assertion/metrics rows come from a single groupBy over the
quads (partial-aggregated map-side — one cheap shuffle of ~#partitions
rows).

Determinism: timestamps and snapshot ids are **passed in** by the caller
(job parameters), never read from the wall clock here — re-runs of the
same inputs produce byte-identical provenance, which the resume logic
(E6) and the golden tests rely on.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import NP, PROV, QUAD_COLS, RDF, XSD


def git_blob_sha1(path: str) -> str:
    """Git-blob-compatible sha1 of a file: sha1(b"blob {size}\\0" + bytes)
    (≅ util/__init__.py:64-83) — identifies the exact source version."""
    size = os.path.getsize(path)
    h = hashlib.sha1()
    h.update(f"blob {size}\0".encode())
    with open(path, "rb") as f:
        while chunk := f.read(1 << 20):
            h.update(chunk)
    return h.hexdigest()


def dataset_sha1(identity: str) -> str:
    """Snapshot identity for table inputs (Iceberg snapshot id, path +
    mtime, ...) folded to a sha1 — the table-world stand-in for the
    file-blob hash."""
    return hashlib.sha1(identity.encode("utf-8")).hexdigest()


class NanopubContext:
    """URI minting for one conversion run (deterministic)."""

    def __init__(self, base: str, name: str, source_hash: str, timestamp: str):
        self.base = base.rstrip("/")
        self.name = name
        self.source_hash = source_hash
        self.timestamp = timestamp  # e.g. "2026-08-16T10:00" (UTC minute)
        hash_part = f"{source_hash[:8]}/{timestamp}"
        mk = lambda kind: f"{self.base}/{name}/{kind}/{hash_part}"  # noqa: E731
        self.np_uri = mk("nanopublication")
        self.assertion = mk("assertion")
        self.provenance = mk("provenance")
        self.pubinfo = mk("pubinfo")
        self.dataset_version = f"{self.base}/{source_hash}"
        self.sdv = self.base + "/vocab/"

    def partition_assertion(self, pid: int) -> str:
        return f"{self.assertion}/partition/{pid}"

    def default_graph_urn(self) -> str:
        """Virtuoso-compatible name for the spine's default graph.

        The reference names its default context ``urn:uuid:<uuid4>``
        because Virtuoso rejects BNode graph names
        (util/__init__.py:164-166) — but random per run, so re-runs
        differ. We derive a uuid5 from the nanopub URI: same shape,
        deterministic (resume/golden tests keep working)."""
        import uuid

        return uuid.uuid5(uuid.NAMESPACE_URL, self.np_uri).urn


def _q(g, s, p, kind, lex, dt=None, lang=None):
    return (g, s, p, kind, lex, dt, lang)


def spine_quads(
    spark: SparkSession,
    ctx: NanopubContext,
    source_path: str,
    generated_by: str = "https://example.com/cow-spark",
) -> DataFrame:
    """Driver-built nanopub spine + run provenance + pubinfo (tiny)."""
    dt_string = XSD + "string"
    dt_datetime = XSD + "dateTime"
    rows = [
        # dataset-version node (util/__init__.py:188-192)
        _q(None, ctx.dataset_version, ctx.sdv + "path", "lit", source_path, dt_string),
        _q(None, ctx.dataset_version, ctx.sdv + "sha1_hash", "lit",
           ctx.source_hash, dt_string),
        # spine (util/__init__.py:210-220)
        _q(None, ctx.np_uri, RDF + "type", "iri", NP + "Nanopublication"),
        _q(None, ctx.np_uri, NP + "hasAssertion", "iri", ctx.assertion),
        _q(None, ctx.assertion, RDF + "type", "iri", NP + "Assertion"),
        _q(None, ctx.np_uri, NP + "hasProvenance", "iri", ctx.provenance),
        _q(None, ctx.provenance, RDF + "type", "iri", NP + "Provenance"),
        _q(None, ctx.np_uri, NP + "hasPublicationInfo", "iri", ctx.pubinfo),
        _q(None, ctx.pubinfo, RDF + "type", "iri", NP + "PublicationInfo"),
        # provenance graph (util/__init__.py:228-233)
        _q(ctx.provenance, ctx.assertion, PROV + "wasDerivedFrom", "iri",
           ctx.dataset_version),
        _q(ctx.provenance, ctx.assertion, PROV + "generatedAtTime", "lit",
           ctx.timestamp, dt_datetime),
        # pubinfo graph (util/__init__.py:243-247)
        _q(ctx.pubinfo, ctx.np_uri, PROV + "wasGeneratedBy", "iri", generated_by),
        _q(ctx.pubinfo, ctx.np_uri, PROV + "generatedAtTime", "lit",
           ctx.timestamp, dt_datetime),
    ]
    return spark.createDataFrame(rows, schema=", ".join(f"{c} string" for c in QUAD_COLS))


def partition_provenance_quads(
    quads_with_pid: DataFrame, ctx: NanopubContext
) -> DataFrame:
    """Per-partition lineage + metrics: one assertion sub-graph per task
    partition with its triple count — computed with a single partial
    aggregation over ``_pid`` (attach via ``F.spark_partition_id()``
    before shuffling ops)."""
    m = quads_with_pid.groupBy("_pid").agg(F.count("*").alias("n_triples"))
    pa = F.concat(F.lit(ctx.assertion + "/partition/"), F.col("_pid").cast("string"))
    dt_int = F.lit(XSD + "integer")
    g = F.lit(ctx.provenance)
    ns = F.lit(None).cast("string")

    def q(s, p, kind, o_lex, o_dt):
        return F.struct(g.alias("g"), s.alias("s"), F.lit(p).alias("p"),
                        F.lit(kind).alias("o_kind"), o_lex.alias("o_lex"),
                        o_dt.alias("o_dt"), ns.alias("o_lang"))

    # one explode, not a 3-way union: Spark has no CSE across union
    # branches, so the union form re-executed the upstream quads pipeline
    # once per branch (same finding as the LSH band builder in dedup.py)
    triples = F.array(
        q(pa, PROV + "wasDerivedFrom", "iri",
          F.lit(ctx.dataset_version), ns),
        q(pa, ctx.sdv + "n_triples", "lit",
          F.col("n_triples").cast("string"), dt_int),
        q(F.lit(ctx.assertion), ctx.sdv + "hasPartition", "iri", pa, ns),
    )
    return m.select(F.explode(triples).alias("q")).select("q.*")


def spec_provenance_quads(spark: SparkSession, ctx: NanopubContext,
                          spec) -> DataFrame:
    """Q1 — record the mapping spec itself in the provenance graph.

    The reference ingests the WHOLE RDF-ized metadata sidecar into the
    provenance graph (convert_info, csvw.py:321-361 — ``pg`` receives
    every schema triple, then SPARQL-filters it for the URL-template
    rules). Our spec is plain JSON parsed driver-side, so this dict
    walk emits the informationally-equivalent graph: the derivation
    link, every schema-level key, and every non-default field of every
    column (URL templates, datatype, lang, null rules, flags) — a user
    can reconstruct the full mapping from the provenance graph alone.
    """
    dt_string = XSD + "string"
    dt_bool = XSD + "boolean"
    spec_uri = f"{ctx.base}/{ctx.name}/spec/{ctx.source_hash[:8]}"
    rows = [
        _q(ctx.provenance, ctx.assertion, PROV + "wasDerivedFrom", "iri",
           spec_uri),
        _q(ctx.provenance, spec_uri, ctx.sdv + "base", "lit",
           spec.base, dt_string),
        _q(ctx.provenance, spec_uri, ctx.sdv + "url", "lit",
           spec.url, dt_string),
        _q(ctx.provenance, spec_uri, ctx.sdv + "aboutUrl", "lit",
           spec.about_url, dt_string),
    ]
    if spec.primary_key is not None:
        # CSVW allows composite keys ("primaryKey": ["a", "b"]) — one
        # triple per component, same predicate
        pks = (spec.primary_key if isinstance(spec.primary_key, (list, tuple))
               else [spec.primary_key])
        for pk in pks:
            rows.append(_q(ctx.provenance, spec_uri, ctx.sdv + "primaryKey",
                           "lit", str(pk), dt_string))
    for n in spec.schema_nulls:
        rows.append(_q(ctx.provenance, spec_uri, ctx.sdv + "null",
                       "lit", n, dt_string))
    for k in sorted(spec.dialect):
        if spec.dialect[k] is not None:
            rows.append(_q(ctx.provenance, spec_uri, ctx.sdv + "dialect_" + k,
                           "lit", str(spec.dialect[k]), dt_string))
    for i, cs in enumerate(spec.columns):
        col_uri = cs.id or f"{spec_uri}/column/{i}"
        rows.append(_q(ctx.provenance, spec_uri, ctx.sdv + "hasColumn",
                       "iri", col_uri))
        if cs.datatype is not None:
            rows.append(_q(ctx.provenance, col_uri, ctx.sdv + "datatype",
                           "iri", cs.datatype))
        for label, tpl in [
            ("name", cs.name), ("lang", cs.lang),
            ("aboutUrl", cs.about_url), ("propertyUrl", cs.property_url),
            ("valueUrl", cs.value_url), ("value", cs.value),
            ("collectionUrl", cs.collection_url),
            ("schemeUrl", cs.scheme_url),
        ]:
            if tpl is not None:
                rows.append(_q(ctx.provenance, col_uri, ctx.sdv + label,
                               "lit", tpl, dt_string))
        for n in cs.nulls:
            rows.append(_q(ctx.provenance, col_uri, ctx.sdv + "null",
                           "lit", n, dt_string))
        for other, val in cs.null_on:
            rows.append(_q(ctx.provenance, col_uri, ctx.sdv + "nullOn",
                           "lit", f"{other}={val}", dt_string))
        for label, flag in [("virtual", cs.virtual),
                            ("parseOnEmpty", cs.parse_on_empty)]:
            if flag:
                rows.append(_q(ctx.provenance, col_uri, ctx.sdv + label,
                               "lit", "true", dt_bool))
    return spark.createDataFrame(
        rows, schema=", ".join(f"{c} string" for c in QUAD_COLS))


def assemble_nanopub(
    quads: DataFrame,
    ctx: NanopubContext,
    source_path: str,
    with_partition_provenance: bool = True,
    virtuoso_compat: bool = False,
) -> DataFrame:
    """Full run output: assertion quads (graph = ctx.assertion) + spine +
    per-partition provenance, one quads DataFrame.

    ``virtuoso_compat`` names the spine's default graph with the
    deterministic ``urn:uuid`` (:meth:`NanopubContext.default_graph_urn`)
    instead of leaving ``g`` NULL — the reference's trick for stores
    that reject unnamed/BNode graphs. Default stays NULL (plain N-Quads
    default-graph lines; graph names are excluded from the parity
    metric either way)."""
    spark = quads.sparkSession
    assertion = quads.withColumn(
        "g", F.coalesce(F.col("g"), F.lit(ctx.assertion))
    ).select(*QUAD_COLS)
    out = spine_quads(spark, ctx, source_path)
    if with_partition_provenance:
        with_pid = quads.withColumn("_pid", F.spark_partition_id())
        out = out.unionByName(partition_provenance_quads(with_pid, ctx))
    if virtuoso_compat:
        out = out.withColumn(
            "g", F.coalesce(F.col("g"), F.lit(ctx.default_graph_urn())))
    return assertion.unionByName(out)
