"""Physical-plan quality gates (input_hint mandate: vectorized
pandas/Arrow UDFs only, no per-row Python; scans pruned and filters
pushed). These pin the plan shape so regressions surface as test
failures, not as silent slowdowns at scale."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))


# queries whose plans may legitimately contain an Arrow-batched Python
# stage (mapInPandas feature kernel / binary-format parser); everything
# else must be JVM-only
_ARROW_OK = {"multimodal_features", "multimodal_meta", "multimodal_resize",
             "multimodal_stdlib", "npy_ingest", "video_frames",
             "audio_segments"}


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_no_per_row_python_stages(spark, name):
    plan = _plan(spark, entry_mod.queries()[name](spark, SF))
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in the plan")
    if name not in _ARROW_OK:
        for marker in ("MapInPandas", "ArrowEvalPython", "FlatMapGroupsInPandas"):
            assert marker not in plan, f"{name}: unexpected Python stage {marker}"


def test_scan_pruning_kg_default(spark):
    """The default-spec extraction reads exactly the mapped columns."""
    plan = _plan(spark, entry_mod.queries()["kg_default_triples"](spark, SF))
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read, plan
    schema = read[0]
    for col in ("doc_id", "text", "lang", "source", "n_chars"):
        assert col in schema
    assert "embedding" not in schema  # untouched columns pruned


def test_filter_pushdown_pricing(spark):
    plan = _plan(spark, entry_mod.queries()["pricing_summary"](spark, SF))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "l_shipdate" in pushed[0], plan


def test_broadcast_dims_order_revenue(spark):
    plan = _plan(spark, entry_mod.queries()["order_revenue"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3, (
        "dimension joins must broadcast, not shuffle")


def test_simhash_hashes_once_per_token(spark):
    """The staged sketch plan computes md5 exactly once; the expression
    variant re-evaluates it per bit (32×) inside interpreted lambdas —
    a regression here is a ~13× slowdown on the corpus scan."""
    plan = _plan(spark, entry_mod.queries()["simhash"](spark, SF))
    assert plan.count("md5") == 1, plan


def test_zero_shuffle_entries_stay_zero_shuffle(spark):
    """split_assign and markup_extract are pure map pipelines — any
    Exchange appearing is a regression (their whole value at 100 TB is
    that they ride along scans for free)."""
    for name in ("split_assign", "markup_extract"):
        plan = _plan(spark, entry_mod.queries()[name](spark, SF))
        assert "Exchange" not in plan, (name, plan)


def test_bm25_stats_travel_by_broadcast(spark):
    """The |query|-sized idf table and the totals must broadcast — a
    sort-merge join here would shuffle the corpus-side tf partials
    against a handful of rows."""
    plan = _plan(spark, entry_mod.queries()["bm25"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_embedding_neardup_cap_is_broadcast(spark):
    """The degenerate-bucket guard must reach the corpus as a broadcast
    join (≤2^bits size rows), never a shuffle of the embedding table."""
    plan = _plan(spark, entry_mod.queries()["embedding_neardup"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan


def test_decontamination_probe_is_broadcast(spark):
    """The benchmark gram set must broadcast — the corpus gram stream
    never shuffles on gram (at 100 TB that shuffle would dwarf the job;
    the eval set is thousands of docs by definition)."""
    plan = _plan(spark, entry_mod.queries()["decontamination"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_pii_scan_is_one_codegen_scan(spark):
    """PII audit is a pure regex expression forest: no join, no
    shuffle, no Python — a single whole-stage-codegen span per scan.
    (Gated on the operator itself: the entry wrapper adds the
    single-file-input repartition, which is a test-data artifact.)"""
    from cow_spark.operators.pii import pii_scan

    df = pii_scan(spark.read.parquet(f"{SF}/documents.parquet"))
    plan = _plan(spark, df)
    for marker in ("Exchange", "Join", "BatchEvalPython"):
        assert marker not in plan, f"unexpected {marker}:\n{plan}"


def test_incremental_dedup_probes_by_broadcast(spark):
    """The batch's bucket keys and the sized index slice must travel as
    broadcasts — the corpus-scale index is never shuffled; only the
    batch-bounded tables move."""
    plan = _plan(spark, entry_mod.queries()["incremental_dedup"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_cdc_chunks_prunes_to_mapped_columns(spark):
    """The CDC scan reads only (doc_id, text) — a chunker that drags
    embeddings/metadata through the char explode multiplies the
    corpus bytes it shuffles. Cache cleared first: a full-width
    documents scan cached by ANY earlier test would be substituted
    into this plan by the CacheManager and fake a pruning failure
    (suite-order flake caught in the r4 final sweep)."""
    spark.catalog.clearCache()
    plan = _plan(spark, entry_mod.queries()["cdc_chunks"](spark, SF))
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read, plan
    assert "doc_id" in read[0] and "text" in read[0]
    assert "embedding" not in read[0] and "n_chars" not in read[0]


def test_warc_scan_is_shuffle_free_pushed_map(spark):
    """WARC parsing is a pure map pipeline over the text scan: no
    shuffle, no join, no Python; the record filter is pushed to the
    source (every operator rides whole-stage codegen — formatted mode
    stars them rather than naming the span)."""
    plan = _plan(spark, entry_mod.queries()["warc_ingest"](spark, SF))
    for marker in ("Exchange", "Join", "BatchEvalPython"):
        assert marker not in plan, f"unexpected {marker}:\n{plan}"
    assert "PushedFilters" in plan
    assert "* Filter" in plan or "* Project" in plan, plan


def test_psi_drift_broadcasts_pooled_side(spark):
    """The pooled bucket distribution joins back by BROADCAST — the
    slice×bucket table never shuffles against a bucket-sized dim."""
    plan = _plan(spark, entry_mod.queries()["psi_drift"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan


def test_bradley_terry_final_joins_stay_broadcast(spark):
    """The visible (post-round-checkpoint) plan joins the
    player-sized ratings/wins/matches tables by broadcast — no
    cartesian products, no sort-merge over vocabulary tables. (The
    per-round normalizer crossJoin is materialized away by the
    eager lineage cut; its 1-row broadcast shape is pinned by the
    operator's own unit tests finishing in round-count time.)"""
    plan = _plan(spark, entry_mod.queries()["bradley_terry"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
