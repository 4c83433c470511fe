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
