"""End-to-end corpus-preparation composition (scripts/run_corpus_prep)."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from run_corpus_prep import prepare_corpus


def test_prepare_corpus_demo_shape(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").withColumn(
        "doc_id", F.col("doc_id").cast("long"))
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    packed, audit = prepare_corpus(
        spark, corpus, benchmark=bench, context=256, n_shards=4,
        rates={"src0": 1.0}, default_rate=0.5)
    rows = packed.collect()

    # the audit explains every document lost between stages
    assert audit["input"] >= audit["after_quality"] >= audit[
        "after_decontamination"] >= audit["after_dedup"] >= audit[
        "after_sampling"] > 0
    assert len(rows) == audit["after_sampling"]
    assert audit["pii_spans_redacted"] == 0  # synthetic docs carry none

    # packed output carries text and a contiguous per-shard stream
    by_shard: dict = {}
    for r in rows:
        assert r["text"] is not None
        by_shard.setdefault(r["shard"], []).append(r)
    for rs in by_shard.values():
        rs.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rs:
            assert r["start_off"] == off
            off += r["n_tokens"]


def test_prepare_corpus_with_span_dedup_and_split(spark):
    """Opt-in stages: markup strip feeds clean text into the gates,
    duplicated spans are cut before quality judgment, and the split
    column rides through packing (straddle-safety itself is pinned in
    test_hash_split_leakage_guard_and_proportions — here the dup is
    removed by the dedup stage before the split even runs)."""
    rows = []
    boiler = "subscribe to our newsletter for daily updates today friends"
    for i in range(40):
        body = " ".join(f"w{i}x{j}" for j in range(30))
        rows.append((i, f"<html><p>{body} {boiler}</p></html>", "web"))
    rows.append((100, rows[0][1], "web"))  # exact dup: dedup keeps one
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    packed, audit = prepare_corpus(
        spark, docs, context=128, n_shards=2, audit_counts=True,
        line_dedup_min_repeats=None, strip_markup_input=True,
        substring_dedup_k=8,
        split_fractions={"train": 0.8, "val": 0.1, "test": 0.1})

    assert audit["substring_tokens_removed"] > 0        # boiler cut
    assert sum(audit["split_sizes"].values()) == audit["after_dedup"]
    got = {r["doc_id"]: r for r in packed.collect()}
    assert all("<" not in r["text"] for r in got.values())  # markup gone
    assert all(boiler not in r["text"] for r in got.values())
    assert all(r["split"] in ("train", "val", "test") for r in got.values())


def test_recipe_validation_and_application(spark, tmp_path):
    """Declarative recipe JSON (r3): unknown keys fail loudly (the
    MappingSpec.validate rule applied to the corpus side); valid keys
    flow into prepare_corpus."""
    import json

    import pytest

    from scripts.run_corpus_prep import RECIPE_KEYS, load_recipe, prepare_corpus

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"context": 128, "mint_tokens": 3}))
    with pytest.raises(ValueError, match="mint_tokens"):
        load_recipe(str(bad))
    notdict = tmp_path / "nd.json"
    notdict.write_text("[1,2]")
    with pytest.raises(ValueError, match="JSON object"):
        load_recipe(str(notdict))

    good = tmp_path / "good.json"
    good.write_text(json.dumps({
        "context": 32, "n_shards": 2, "min_tokens": 2,
        "split_fractions": {"train": 0.5, "val": 0.25, "test": 0.25},
    }))
    recipe = load_recipe(str(good))
    assert set(recipe) <= RECIPE_KEYS

    docs = spark.createDataFrame(
        [(i, f"document number {i} with several distinct words "
             f"variant {i * 13}", "src0") for i in range(30)],
        "doc_id long, text string, source string")
    packed, audit = prepare_corpus(
        spark, docs,
        context=recipe["context"], n_shards=recipe["n_shards"],
        min_tokens=recipe["min_tokens"],
        split_fractions=recipe["split_fractions"])
    rows = packed.collect()
    assert rows and {r["split"] for r in rows} <= {"train", "val", "test"}
    assert {r["shard"] for r in rows} <= {0, 1}
    assert sum(audit["split_sizes"].values()) == audit["after_dedup"]


def test_prepare_corpus_blocklist_stage(spark):
    """URL-screened docs are dropped before any text judgment, and the
    audit explains the loss."""
    docs = spark.createDataFrame(
        [(i, ("visit https://bad.example/x now " if i % 4 == 0 else "")
          + "plain prose with enough tokens to pass the quality gate "
          + f"document {i}", "src0")
         for i in range(40)],
        "doc_id long, text string, source string")
    packed, audit = prepare_corpus(
        spark, docs, context=128, n_shards=2,
        line_dedup_min_repeats=None,
        blocklist_domains=["bad.example"])
    assert audit["after_blocklist"] == 30
    kept = {r["doc_id"] for r in packed.collect()}
    assert kept and all(i % 4 != 0 for i in kept)
