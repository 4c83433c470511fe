"""spark-submit entry point for pre-training corpus preparation.

The training-data side of the engine, composed end-to-end::

    [markup strip] → [URL blocklist screen] → boilerplate line removal
    → [duplicated-span cut] → quality gate → PII redaction
    → benchmark decontamination → near-dup dedup (canonical survivors)
    → stratified sampling → [leakage-safe train/val/test split]
    → sequence packing → packed-corpus manifest + audit stats

(bracketed stages opt-in; the split is keyed on the post-clean
fingerprint so residual exact duplicates can never straddle splits)

Cluster deployment mirrors run_pipeline.py (spark-submit --py-files);
local smoke::

    python scripts/run_corpus_prep.py --demo

Every stage is a DataFrame plan from cow_spark.operators — no stage
collects, and the stage order matters: dedup runs AFTER redaction (two
documents identical up to their PII should dedup together) and the
pack runs LAST (offsets are only stable once membership is final).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def prepare_corpus(
    spark,
    docs,
    benchmark=None,
    rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    context: int = 2048,
    n_shards: int = 64,
    min_tokens: int = 5,
    audit_counts: bool = True,
    line_dedup_min_repeats: int | None = 3,
    strip_markup_input: bool = False,
    substring_dedup_k: int | None = None,
    split_fractions: dict[str, float] | None = None,
    blocklist_domains: list[str] | None = None,
    stage_checkpoint: bool = False,
):
    """documents(doc_id, text, source?) → (packed plan, audit dict).

    Returns the packed-corpus DataFrame (doc_id, shard, n_tokens,
    start_off, bin_first, bin_last, n_bins, text) and a per-stage audit
    of how many documents each gate removed — corpus shrinkage must be
    explainable, not just observed. Each audit count is an action that
    re-executes the lineage up to its stage; at full scale either run
    with ``audit_counts=False`` (one job, no counts) or persist the
    intermediate tables — the audit is a debugging/reporting mode, not
    the production hot path.

    ``stage_checkpoint``: materialize ``docs`` (localCheckpoint with
    carried-stats stripped) after every mutating stage. Several stages
    JOIN the running corpus against a table derived FROM the running
    corpus (line/span rewrites, quality keep-set, PII redaction, dedup
    survivors) — without a cut, each such self-join DOUBLES the live
    upstream plan and the chained pipeline's final stage re-executes
    the front 2^k times while holding every intermediate's buffers (the
    union-branch no-CSE gotcha, join edition; the 8 GB demo JVM hit
    UNABLE_TO_ACQUIRE_MEMORY in r4 exactly here). Real corpus runs
    materialize stage tables to storage anyway; this is the in-session
    equivalent for demos/tests.
    """
    from pyspark.sql import functions as F

    from cow_spark.operators.corpus import pack_sequences, stratified_sample
    from cow_spark.operators.decontam import decontaminate
    from cow_spark.operators.dedup import near_duplicate_groups, release
    from cow_spark.operators.pii import pii_scan
    from cow_spark.operators.quality import (quality_filter,
                                             remove_repeated_lines)

    def _n(d):
        return d.count() if audit_counts else -1

    from cow_spark.operators.canon import round_checkpoint

    def _cut(d):
        return round_checkpoint(d, None) if stage_checkpoint else d

    audit: dict = {"input": _n(docs)}

    if strip_markup_input:
        # crawl-shaped input: extract text from markup before any
        # text-based judgment (quality ratios on raw HTML are garbage)
        from cow_spark.functions.text import strip_markup

        docs = docs.withColumn("text", strip_markup(F.col("text")))

    if blocklist_domains:
        # UT1-style URL screening FIRST (the CCNet/RefinedWeb order):
        # a doc linking to a blocked domain is dropped before any text
        # judgment — cheapest gate, and its verdict is text-independent
        from cow_spark.operators.quality import blocklist_filter

        bl = spark.createDataFrame(
            [(d,) for d in blocklist_domains], "domain string")
        flags = blocklist_filter(docs, bl)
        docs = docs.join(
            flags.where(F.col("blocked") == 0).select("doc_id"), "doc_id")
        audit["after_blocklist"] = _n(docs)

    if line_dedup_min_repeats:
        # C4 order: strip corpus-level boilerplate LINES before any
        # doc-level judgment — a doc that is prose plus chrome should
        # be judged (and deduped) on its prose
        cleaned = remove_repeated_lines(
            docs, min_repeats=line_dedup_min_repeats)
        audit["boilerplate_lines_removed"] = (
            int(cleaned.agg(F.sum("n_removed")).first()[0] or 0)
            if audit_counts else -1)
        docs = _cut(cleaned.select("doc_id", "text").join(
            docs.drop("text"), "doc_id"))

    if substring_dedup_k:
        # span-level complement of the line rule: cut every k-token
        # passage duplicated anywhere in the corpus (Lee et al. 2022).
        # Only documents that actually LOST a span get the rewritten
        # text (which is a normalized-token rejoin — casing/layout of
        # cut documents is necessarily normalized); untouched documents
        # keep their original bytes.
        from cow_spark.operators.dedup import remove_duplicated_spans

        spans = remove_duplicated_spans(docs, k=substring_dedup_k)
        audit["substring_tokens_removed"] = (int(
            spans.agg(F.sum(F.col("n_tok") - F.col("kept_tok")))
            .first()[0] or 0) if audit_counts else -1)
        changed = spans.where(F.col("kept_tok") < F.col("n_tok")) \
            .select("doc_id", F.col("cleaned_text").alias("_new"))
        docs = _cut(docs.join(changed, "doc_id", "left")
                .withColumn("text",
                            F.coalesce(F.col("_new"), F.col("text")))
                .drop("_new"))

    kept = quality_filter(docs, min_tokens=min_tokens).where(F.col("keep"))
    docs = _cut(docs.join(kept.select("doc_id"), "doc_id"))
    audit["after_quality"] = _n(docs)

    red = pii_scan(docs)
    audit["pii_spans_redacted"] = (int(
        red.agg(F.sum("n_pii")).first()[0] or 0) if audit_counts else -1)
    docs = _cut(red.select("doc_id", F.col("redacted").alias("text"))
                .join(docs.drop("text"), "doc_id"))

    if benchmark is not None:
        docs = decontaminate(docs, benchmark)
        audit["after_decontamination"] = _n(docs)

    groups = near_duplicate_groups(docs)
    survivors = groups.where(F.col("is_canonical")).select("doc_id")
    docs = _cut(docs.join(survivors, "doc_id"))
    audit["after_dedup"] = _n(docs)
    release(groups)

    if rates:
        docs = stratified_sample(docs, rates, default_rate=default_rate)
        audit["after_sampling"] = _n(docs)

    if split_fractions:
        from cow_spark.functions.text import fingerprint
        from cow_spark.operators.corpus import hash_split

        docs = hash_split(
            docs.withColumn("_fp", fingerprint(F.col("text"))),
            split_fractions, group_col="_fp").drop("_fp")
        if audit_counts:
            audit["split_sizes"] = {
                r["split"]: r["count"]
                for r in docs.groupBy("split").count().collect()}

    packed = pack_sequences(docs, context=context, n_shards=n_shards).join(
        docs.select("doc_id", "text",
                    *(["split"] if split_fractions else [])), "doc_id")
    audit["packed_docs"] = audit.get("after_sampling", audit["after_dedup"])
    return packed, audit


# the declarative recipe surface: JSON keys accepted by --config, each
# mapping 1:1 onto a prepare_corpus parameter (input/benchmark/output
# are path plumbing). The same sidecar-spec ethos as the KG mapping
# spec: the WHOLE pipeline is data, reviewable and diffable, and an
# unknown key is an error — a typo'd gate must never silently not run.
RECIPE_KEYS = {
    "input", "benchmark", "output",
    "rates", "default_rate", "context", "n_shards", "min_tokens",
    "audit_counts", "line_dedup_min_repeats", "strip_markup_input",
    "substring_dedup_k", "split_fractions", "blocklist_domains",
    "stage_checkpoint",
}


def load_recipe(path: str) -> dict:
    """Parse + validate a corpus-prep recipe JSON (fail-loud on unknown
    keys, like MappingSpec.validate on the KG side)."""
    with open(path) as f:
        recipe = json.load(f)
    if not isinstance(recipe, dict):
        raise ValueError(f"recipe must be a JSON object, got {type(recipe)}")
    unknown = sorted(set(recipe) - RECIPE_KEYS)
    if unknown:
        raise ValueError(
            f"unknown recipe key(s) {unknown}; accepted: "
            f"{sorted(RECIPE_KEYS)}")
    return recipe


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="documents table path (doc_id, text, source)")
    ap.add_argument("--benchmark", help="held-out eval documents path")
    ap.add_argument("--output", default="out/corpus", help="output root")
    ap.add_argument("--context", type=int, default=None)
    ap.add_argument("--shards", type=int, default=None)
    ap.add_argument("--rates", help='JSON source→rate map, e.g. \'{"web":0.5}\'')
    ap.add_argument("--config", help="declarative recipe JSON (see "
                                     "RECIPE_KEYS); explicit flags override")
    ap.add_argument("--demo", action="store_true",
                    help="run on the sf0.01 synthetic documents")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cow_spark.session import get_session

    recipe = load_recipe(args.config) if args.config else {}
    # explicit CLI flags override the recipe; the recipe overrides
    # the built-in defaults
    input_path = args.input or recipe.get("input")
    bench_path = args.benchmark or recipe.get("benchmark")
    out_root = (args.output if args.output != "out/corpus"
                else recipe.get("output", args.output))

    spark = get_session(app_name="cow_spark-corpus-prep")
    if args.demo:
        docs = spark.read.parquet(
            "/root/testdata/sf0.01/documents.parquet").withColumn(
            "doc_id", F.col("doc_id").cast("long"))
        bench = docs.where(F.col("doc_id") % 97 == 0)
        docs = docs.where(F.col("doc_id") % 97 != 0)
        rates = {"src0": 1.0}
        default_rate = 0.5
    else:
        docs = spark.read.parquet(input_path)
        bench = (spark.read.parquet(bench_path) if bench_path else None)
        rates = (json.loads(args.rates) if args.rates
                 else recipe.get("rates"))
        default_rate = recipe.get("default_rate", 1.0)

    kwargs = {
        k: recipe[k] for k in (
            "min_tokens", "audit_counts", "line_dedup_min_repeats",
            "strip_markup_input", "substring_dedup_k", "split_fractions",
            "blocklist_domains", "stage_checkpoint")
        if k in recipe
    }
    if args.demo:
        kwargs.setdefault("substring_dedup_k", 8)
        kwargs.setdefault("split_fractions",
                          {"train": 0.9, "val": 0.05, "test": 0.05})
        kwargs.setdefault("stage_checkpoint", True)
    packed, audit = prepare_corpus(
        spark, docs, benchmark=bench, rates=rates,
        default_rate=default_rate,
        context=args.context or recipe.get("context", 2048),
        n_shards=args.shards or recipe.get("n_shards", 64),
        **kwargs)
    packed.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(out_root, "packed"))
    print(json.dumps(audit))
    spark.stop()


if __name__ == "__main__":
    main()
