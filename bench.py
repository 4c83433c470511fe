"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Timings use the noop sink (full execution, no driver collect). The
flagship is the transcript KG pipeline (synthetic transcripts sized by
sf: extraction → mentions → broadcast linking), reported both as seconds
and triples/sec — the BASELINE.md comparison point against the
reference's ~125 rows/s/core.

Scaling evidence (north_rule): run this file twice with
SPARK_GRAFT_CPUS=8 and =32 on the same input; BENCH/BASELINE.md records
the pair + efficiency.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from cow_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# The per-query sweep covers EVERY driver entry (295/295, each
# oracle-checked) so the recorded bench is literally complete; the
# list below pins the sweep order (stable across rotations of
# queries() — new entries append via the queries() union at the end
# of main's qmap loop).
HEADLINE = [
    "kg_default_triples",
    "kg_full_triples",
    "pricing_summary",
    "order_revenue",
    "mentions",
    "entity_link",
    "text_stats",
    "minhash_bands",
    "simhash",
    "knn_cosine",
    "ivf_topk",
    "pq_topk",
    "semdedup",
    "dedup_groups",
    "bgp_query",
    "pagerank",
    "tfidf_topk",
    "incremental_dedup",
    "decontamination",
    "line_dedup",
    "substring_dedup",
    "bm25",
    "asof_join",
    "sessionize",
    "lm_surprisal",
    "cross_doc_ngrams",
    "chunk_documents",
    "hll_profile",
    "kcore",
    "url_blocklist",
    "bloom_filter",
    "random_walks",
    "bpe_train",
    "cms_counts",
    "rolling_anomaly",
    "bgp_select",
    "weighted_sample",
    "negative_samples",
    "integrity_report",
    "label_propagation",
    "bpe_segment",
    "quantile_sketch",
    "link_prediction",
    "rdfs_closure",
    "khop_sample",
    "personalized_pagerank",
    "clustering_coefficient",
    "node2vec_walks",
    "shortest_paths",
    "incremental_canon",
    "bgp_minus",
    "zorder_layout",
    "hyperball",
    "path_expr",
    "values_query",
    "ask_query",
    "group_concat",
    "subquery",
    "ifp_sameas",
    "gap_fill",
    "scc",
    "ktruss",
    "owl_closure",
    "er_eval",
    "blocking_eval",
    "sparql_update",
    "kg_snapshot",
    "url_dedup",
    "weighted_paths",
    "neighbor_agg",
    "scc_fwbw",
    "coref_resolve",
    "kg_resolve",
    "corpus_drift",
    "characteristic_sets",
    "modularity",
    "ranking_eval",
    "fs_weights",
    "harmonic_centrality",
    "rdf_list_unroll",
    "quote_attribution",
    "allen_relations",
    "betweenness",
    "hits",
    "snm_blocking",
    "metapath_counts",
    "taxonomy_rollup",
    "infer_datatypes",
    "interval_coalesce",
    "edit_verify",
    "msf",
    "single_linkage",
    "wl_colors",
    "set_similarity",
    "butterflies",
    "graph_mixing",
    "turn_coherence",
    "path_range",
    "wl_quotient",
    "readability",
    "rdf_containers",
    "prefix_duplicates",
    "rdf_reified",
    "predicate_profile",
    "k_anonymity",
    "transe_score",
    "alias_priors",
    "vocab_growth",
    "zipf_alpha",
    "role_entropy",
    "injection_scan",
    "tool_latency",
    "inclusion_deps",
    "topic_segments",
    "split_leakage",
    "functional_deps",
    "column_mi",
    "tool_ngrams",
    "action_loops",
    "horn_rules",
    "benford",
    "null_patterns",
    "speech_acts",
    "lexicon_scan",
    "code_detect",
    "neighborhood_fn",
    "pattern_triples",
    "key_skew",
    "encoding_health",
    "score_calibrate",
    "join_estimate",
    "mention_timeline",
    "shape_pairs",
    "fd_repair",
    "render_convs",
    "fixed_width",
    "extract_json",
    "conversation_outcome",
    "turn_gaps",
    "bnode_canon",
    "void_summary",
    "kn_bigram",
    "kmv_sketch",
    "katz",
    "type_predict",
    "bipartite",
    "kmv_overlap",
    "textrank",
    "mad_outliers",
    "npy_ingest",
    "key_discovery",
    "dyad_census",
    "canon_conflicts",
    "term_bursts",
    "rich_club",
    "dedup_survivors",
    "script_profile",
    "judge_kappa",
    "rouge_overlap",
    "score_auc",
    "classifier_eval",
    "ks_test",
    "preference_pairs",
    "triad_motifs",
    "basket_rules",
    "cusum_alarm",
    "domain_range",
    "jsd_slices",
    "rank_corr",
    "reliability_curve",
    "sqlite_ingest",
    "mann_whitney",
    "gini_index",
    "mixture_allocate",
    "wilson_bounds",
    "chi_square",
    "xml_ingest",
    "namespace_induction",
    "vec_quantize",
    "eigenvector",
    "owl_chains",
    "runs_test",
    "fim_transform",
    "lag_autocorr",
    "fano_factor",
    "pareto_frontier",
    "tar_ingest",
    "video_frames",
    "decay_score",
    "winsorize",
    "embedding_drift",
    "unk_rate",
    "example_sample",
    "schema_diff",
    "hard_negatives",
    "sentence_split",
    "soundex_keys",
    "random_projection",
    "attribution",
    "quantile_normalize",
    "ab_lift",
    "krippendorff",
    "bradley_terry",
    "mann_kendall",
    "vocab_richness",
    "distinct_ngrams",
    "char_entropy",
    "warc_ingest",
    "cdc_chunks",
    "audio_segments",
    "holt_forecast",
    "psi_drift",
    "grouped_linfit",
    "ams_f2",
    "kaplan_meier",
    "benjamini_hochberg",
    "conformal_threshold",
    "absorption_probs",
    "cuped",
    "diff_in_diff",
    "fs_em",
    "stream_tool_join",
    "cascade_eval",
    "hub_ablation",
]

# full sweep = the pinned order above (comparable across rounds) +
# every remaining queries() entry appended, so n_queries covers all 295
SWEEP = HEADLINE + [q for q in entry.queries() if q not in set(HEADLINE)]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _run(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def transcript_pipeline(spark, n_slots: int):
    """Flagship: synthetic transcripts → triples + linked mentions."""
    from cow_spark.operators.extract import extract_quads
    from cow_spark.operators.link import link_mentions
    from cow_spark.operators.mentions import detect_mentions, gazetteer_pattern
    from cow_spark.sources.transcripts import (
        CITIES,
        PERSONS,
        entities_df,
        transcripts_df,
    )
    from cow_spark.spec.mapping import MappingSpec
    from cow_spark.spec.presets import transcripts_full_spec

    t = transcripts_df(spark, n_slots)
    spec = MappingSpec.from_json(transcripts_full_spec())
    quads = extract_quads(t, spec)
    mentions = detect_mentions(t, gazetteer_pattern(PERSONS + CITIES))
    linked = link_mentions(mentions, entities_df(spark, 1000))
    return t, quads, linked


def main() -> None:
    sf = _sf_from_dir(SF_DIR)
    spark = get_session(
        master=f"local[{CPUS}]", app_name="cow_spark-bench",
        shuffle_partitions=2 * CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM/JIT, parquet footer reads, and Python-worker/Arrow
    # startup are not what we benchmark
    spark.read.parquet(f"{SF_DIR}/nation.parquet").write.format(
        "noop").mode("overwrite").save()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _warm(s):
        return s

    spark.range(1000).selectExpr("cast(id as string) s") \
        .select(_warm("s")).write.format("noop").mode("overwrite").save()

    # warm the flagship path itself on a small slice (codegen classes +
    # C2 compilation of the regex/string loops): the flagship now runs
    # FIRST, so without this the timed run pays one-time JIT costs the
    # old end-of-sweep position amortized across 200+ prior queries
    # (measured: transcript_link 7.3 s cold vs 3.8 s warm at sf0.1)
    _wt, _wq, _wl = transcript_pipeline(spark, 20_000)
    _wq.write.format("noop").mode("overwrite").save()
    _wl.count()

    timings: dict[str, float] = {}

    # ---- flagship transcript KG pipeline FIRST (uncontended) ----
    # r4's recorded headline drifted −13% while the interleaved sweep
    # grew to 234 queries; an uncontended re-run landed back at the
    # r3 level. The flagship is THE baseline-comparison number, so it
    # is measured before the sweep touches the JVM, best-of-2 like
    # every other query (min = steady state, comparable across rounds).
    n_slots = max(int(10_000_000 * sf), 20_000)
    t, quads, linked = transcript_pipeline(spark, n_slots)
    n_turns = t.count()
    timings["transcript_kg_extract"] = round(
        min(_run(quads), _run(quads)), 3)
    n_triples = quads.count()  # untimed, for the throughput stats

    # same extraction without the global-dedup shuffle (COW itself only
    # dedups per chunk; 'global' is our stricter engine default) — shows
    # what the dedup semantics cost vs the pure extraction pipeline
    from cow_spark.operators.extract import extract_quads as _eq
    from cow_spark.sources.transcripts import transcripts_df as _tdf
    from cow_spark.spec.mapping import MappingSpec as _MS
    from cow_spark.spec.presets import transcripts_full_spec as _tfs

    raw = _eq(_tdf(spark, n_slots), _MS.from_json(_tfs()), dedup="none")
    timings["transcript_kg_extract_nodedup"] = round(
        min(_run(raw), _run(raw)), 3)

    # the Arrow-batched Jinja fallback (templates the static compiler
    # can't lower) — COW's 25-50% hot path; measured honestly since the
    # full spec lowers everything and would otherwise never exercise it
    jinja_spec = _MS.from_json({
        "@base": "https://example.com/id/transcripts",
        "url": "transcripts",
        "tableSchema": {
            "aboutUrl": "{conv_id}/turn/{turn_idx}",
            "columns": [{
                "name": "text",
                "propertyUrl": "vocab/textHead",
                "value": "{% if text %}{{ text[:12]|upper }}"
                         "{% else %}EMPTY{% endif %}",
            }],
        },
    })
    jq = _eq(_tdf(spark, n_slots), jinja_spec, dedup="none")
    timings["jinja_fallback_extract"] = round(min(_run(jq), _run(jq)), 3)

    # link + canon best-of-2 like every other timing (they were the
    # only single-shot numbers left; each run starts from a cold
    # persist so the min isolates JIT/codegen state, not cache hits)
    from cow_spark.operators.canon import canonical_entities

    best_link = best_canon = float("inf")
    for _ in range(2):
        lp = linked.persist()
        t0 = time.perf_counter()
        n_linked = lp.count()
        best_link = min(best_link, time.perf_counter() - t0)
        t0 = time.perf_counter()
        n_components = (
            canonical_entities(lp).select("canonical_id")
            .distinct().count()
        )
        best_canon = min(best_canon, time.perf_counter() - t0)
        lp.unpersist()
    timings["transcript_link"] = round(best_link, 3)
    timings["transcript_canon"] = round(best_canon, 3)

    # ---- full per-query sweep (all 295 driver entries) ----
    qmap = entry.queries()
    for name in SWEEP:
        # best-of-2: one-time costs (codegen compile, JIT warm-up for
        # this plan's generated classes, scheduler position in the
        # sweep) dominated the r2 per-query drift (±0.2-1.1 s on
        # sub-second queries); the min of two runs is the steady-state
        # number that is comparable across rounds. Each run re-times
        # construction + execution: iterative queries (dedup_groups'
        # CC loop) do real work eagerly while building the plan.
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = qmap[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            # free any sketch/pair tables the query persisted (dedup
            # family) so they don't sit in MEMORY_AND_DISK under later
            # queries / the second run
            for cached in getattr(df, "_cow_persisted", ()):
                cached.unpersist()
            best = min(best, dt)
        timings[name] = round(best, 3)

    # the documents table is small at every sf (5k rows at sf0.1), so the
    # per-doc dedup sketches above are overhead-bound; this replicated
    # 20× corpus (same text distribution) exposes the per-row hot path —
    # the staged simhash plan runs it ~13× faster than the bitwise
    # expression fold it replaced
    from cow_spark.operators.dedup import simhash_sketches as _ss

    docs20 = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .crossJoin(spark.range(20).withColumnRenamed("id", "_rep"))
        .selectExpr("cast(doc_id as long) * 20 + _rep as doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    timings["simhash_bulk20x"] = round(_run(_ss(docs20)), 3)

    # scan-bound ops on the same 100k-doc corpus: the PII regex forest
    # (pure codegen span) and the decontamination broadcast probe
    from cow_spark.operators.decontam import contamination as _cont
    from cow_spark.operators.pii import pii_scan as _pii

    docs20 = docs20.persist()
    docs20.count()
    timings["pii_bulk20x"] = round(_run(_pii(docs20)), 3)
    bench_docs = docs20.where(F.col("doc_id") % 97 == 0)
    timings["decontam_bulk20x"] = round(
        _run(_cont(docs20.where(F.col("doc_id") % 97 != 0), bench_docs)), 3)
    from cow_spark.operators.quality import remove_repeated_lines as _rrl

    # every doc is replicated 20x, so every eligible line is corpus-level
    # boilerplate — the adversarial everything-removed case
    timings["line_dedup_bulk20x"] = round(_run(_rrl(docs20)), 3)
    # exact-substring dedup on the same 100k-doc corpus: with 20 copies
    # of every doc, every k-gram is duplicated — the adversarial
    # everything-covered case for the island merge + rewrite
    from cow_spark.operators.dedup import remove_duplicated_spans as _rds

    timings["substring_dedup_bulk20x"] = round(_run(_rds(docs20, k=5)), 3)
    docs20.unpersist()

    total = round(sum(timings.values()), 3)
    kg_secs = timings["transcript_kg_extract"]
    # The full per-query map (~80 entries) overflowed the driver's
    # tail-capture window in r3 (BENCH_r03 `parsed: null`): the
    # headline line must stay SHORT. Print flagship totals + a small
    # fixed subset of query timings; write the full map to a side file.
    side = {
        "sf": sf, "cpus": CPUS, "n_queries": len(timings),
        "queries": timings,
    }
    side_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH", "bench_queries_latest.json")
    try:
        with open(side_path, "w") as fh:
            json.dump(side, fh, indent=1, sort_keys=True)
    except OSError:
        pass  # read-only checkout: the headline line still carries totals
    headline_keys = [
        "transcript_kg_extract", "transcript_link", "transcript_canon",
        "dedup_groups", "semdedup", "ivf_topk", "pagerank", "sessionize",
    ]
    out = {
        "metric": "bench_total_seconds",
        "value": total,
        "unit": "sec",
        "queries": {k: timings[k] for k in headline_keys if k in timings},
        "queries_full": side_path,
        "sf": sf,
        "cpus": CPUS,
        "n_queries": len(timings),
        "transcript_turns": n_turns,
        "transcript_triples": n_triples,
        "linked_mentions": n_linked,
        "canonical_components": n_components,
        "triples_per_sec": round(n_triples / kg_secs, 1) if kg_secs > 0 else None,
        "turns_per_sec": round(n_turns / kg_secs, 1) if kg_secs > 0 else None,
        "turns_per_sec_nodedup": round(
            n_turns / timings["transcript_kg_extract_nodedup"], 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
