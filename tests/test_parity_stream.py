"""Parity metric harness + streaming windowed aggregation."""

import pyspark.sql.functions as F

from cow_spark.operators.extract import extract_quads
from cow_spark.plans.parity import as_triple_set, parse_nquads, precision_recall
from cow_spark.sources.sinks import write_nquads
from cow_spark.spec.mapping import MappingSpec
from cow_spark.spec.presets import transcripts_default_spec
from cow_spark.sources.transcripts import PERSONS, transcripts_df


def test_parity_roundtrip_through_nquads(spark, tmp_path):
    """Engine → N-Quads file → parse back → P/R must be exactly 1.0
    (also proves the N-Quads writer/parser agree on escaping)."""
    spec = MappingSpec.from_json(transcripts_default_spec())
    quads = extract_quads(transcripts_df(spark, 300), spec,
                          graph="https://example.com/g/run")
    out = str(tmp_path / "nq")
    write_nquads(quads, out)
    parsed = parse_nquads(spark.read.text(out))
    m = precision_recall(as_triple_set(quads), parsed)
    assert m["precision"] == 1.0 and m["recall"] == 1.0, m


def test_parity_detects_divergence(spark):
    spec = MappingSpec.from_json(transcripts_default_spec())
    a = as_triple_set(extract_quads(transcripts_df(spark, 300), spec))
    b = as_triple_set(extract_quads(transcripts_df(spark, 200), spec))
    m = precision_recall(b, a)
    assert m["recall"] < 1.0 and m["precision"] == 1.0


def test_stream_windowed_mention_rates(spark, tmp_path):
    from cow_spark.operators.mentions import gazetteer_pattern
    from cow_spark.streaming.stream import (
        read_transcripts_stream,
        stream_mention_rates,
    )

    src = str(tmp_path / "landing")
    t = transcripts_df(spark, 400)
    t.write.parquet(src)
    stream = read_transcripts_stream(spark, src, max_files_per_trigger=2)
    pat = gazetteer_pattern(PERSONS)
    rates = stream_mention_rates(stream, pat, window="10 minutes",
                                 watermark="0 seconds")
    out = str(tmp_path / "rates")
    (
        rates.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = spark.read.parquet(out)
    # batch equivalent, restricted to windows the watermark finalized
    # (append mode never flushes the window containing the max event time)
    max_ts = t.agg(F.max("ts")).first()[0]
    want = (
        t.select(F.window("ts", "10 minutes").alias("w"),
                 F.explode(F.regexp_extract_all(F.col("text"), F.lit(pat), 0)
                           ).alias("mention"))
        .groupBy(F.col("w.start").alias("window_start"),
                 F.col("w.end").alias("_end"), F.col("mention"))
        .agg(F.count("*").alias("n"))
        .where(F.col("_end") <= F.lit(max_ts))
        .drop("_end")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() > 0


def test_stream_conversation_sessions_stateful(spark, tmp_path):
    """applyInPandasWithState session assembly: summaries accumulate
    across micro-batches and match the batch groupBy computed over the
    same data (update-mode rows: last emission per conv wins)."""
    from cow_spark.streaming.stream import (
        read_transcripts_stream,
        stream_conversation_sessions,
    )

    src = str(tmp_path / "landing")
    t = transcripts_df(spark, 320)
    # several files so the stream runs multiple micro-batches and state
    # actually carries across batches
    t.repartition(4).write.parquet(src)
    stream = read_transcripts_stream(spark, src, max_files_per_trigger=1)
    # watermark must cover the fixture's full event-time span: files are
    # unordered, so a tight watermark would drop older files' rows as late
    sessions = stream_conversation_sessions(stream, watermark="2 hours",
                                            gap="1 minutes")
    (
        sessions.writeStream.outputMode("update")
        .format("memory")
        .queryName("sessions_t")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(180)
    )
    got = spark.table("sessions_t")
    # last (highest-n_turns) emission per conversation = final summary
    final = (
        got.groupBy("conv_id")
        .agg(F.max(F.struct("n_turns", "n_chars")).alias("x"))
        .select("conv_id", "x.n_turns", "x.n_chars")
    )
    want = (
        t.groupBy("conv_id")
        .agg(F.count("*").alias("n_turns"),
             F.sum(F.length(F.coalesce(F.col("text"), F.lit(""))))
             .alias("n_chars"))
    )
    diff = final.join(want, "conv_id") \
        .where((final["n_turns"] != want["n_turns"])
               | (final["n_chars"] != want["n_chars"]))
    assert final.count() == want.count()
    assert diff.count() == 0
