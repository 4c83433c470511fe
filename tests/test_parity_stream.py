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


def test_duration_grammar():
    from cow_spark.streaming.stream import _duration_ms

    assert _duration_ms("30 seconds") == 30_000
    assert _duration_ms("1 hour 30 minutes") == 5_400_000
    assert _duration_ms("1 day") == 86_400_000
    import pytest as _pt
    with _pt.raises(ValueError):
        _duration_ms("soon")


def test_stream_sessions_split_on_event_time_gap(spark, tmp_path):
    """Turns more than `gap` apart in event time form separate sessions,
    including gaps that only become visible across micro-batches."""
    import datetime as dt

    from cow_spark.streaming.stream import (
        read_transcripts_stream,
        stream_conversation_sessions,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def row(turn, minutes):
        return ("conv-A", turn, "user", "x" * 10, None,
                t0 + dt.timedelta(minutes=minutes))

    ddl = ("conv_id string, turn_idx int, role string, text string, "
           "tool string, ts timestamp")
    src = str(tmp_path / "landing")
    # file 1: two turns 10s apart; file 2: one turn 2 hours later —
    # the 2h silence must split the session even though the state never
    # times out between the back-to-back micro-batches
    spark.createDataFrame([row(0, 0), row(1, 0.2)], ddl) \
        .coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame([row(2, 120)], ddl) \
        .coalesce(1).write.mode("append").parquet(src)

    # watermark delay 0: the 14:00 batch advances the watermark past the
    # 12:00 session's last+gap, so the timeout/no-data batch closes it —
    # sessions must NEVER close on an observed gap alone (a late event
    # within the watermark could still bridge it)
    stream = read_transcripts_stream(spark, src, max_files_per_trigger=1)
    sessions = stream_conversation_sessions(stream, watermark="0 seconds",
                                            gap="1 minutes")
    (
        sessions.writeStream.outputMode("update")
        .format("memory").queryName("gap_sessions")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(180)
    )
    got = spark.table("gap_sessions").collect()
    closed = [r for r in got if r.closed]
    # first session (2 turns) closed by the later batch's gap
    assert any(r.n_turns == 2 and r.n_chars == 20 for r in closed)
    # second session live with 1 turn
    assert any((not r.closed) and r.n_turns == 1 for r in got)


def test_stream_sessions_randomized_matches_reference(spark, tmp_path):
    """Randomized sessionization: events delivered in arbitrary batch
    order must converge to exactly the sessions a reference Python
    sessionizer computes over the full event set (covering watermark →
    no late drops, no closures; final open candidates = true sessions).
    Every emitted row must also be a sub-aggregate of one true session
    (candidates only ever merge toward the final answer)."""
    import datetime as dt
    import random

    from cow_spark.streaming.stream import (
        read_transcripts_stream,
        stream_conversation_sessions,
    )

    rng = random.Random(42)
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    GAP_S = 600  # 10 minutes

    events = []
    for conv in ["cA", "cB", "cC"]:
        for turn in range(14):
            ts = t0 + dt.timedelta(seconds=rng.randrange(0, 3 * 3600))
            events.append((conv, turn, "user", "y" * rng.randrange(1, 9),
                           None, ts))

    # reference sessionizer over the complete event set
    def sessions_of(rows):
        out = {}
        by_conv = {}
        for r in rows:
            by_conv.setdefault(r[0], []).append(r)
        for conv, rs in by_conv.items():
            rs.sort(key=lambda r: r[5])
            cur = None
            sess = []
            for r in rs:
                if cur and (r[5] - cur["last"]).total_seconds() > GAP_S:
                    sess.append(cur)
                    cur = None
                if cur is None:
                    cur = {"n": 0, "ch": 0, "first": r[5], "last": r[5]}
                cur["n"] += 1
                cur["ch"] += len(r[3])
                cur["last"] = max(cur["last"], r[5])
            sess.append(cur)
            out[conv] = {(s["n"], s["ch"], s["first"], s["last"])
                         for s in sess}
        return out

    want = sessions_of(events)

    ddl = ("conv_id string, turn_idx int, role string, text string, "
           "tool string, ts timestamp")
    src = str(tmp_path / "landing")
    rng.shuffle(events)
    for chunk in (events[:14], events[14:28], events[28:]):
        spark.createDataFrame(chunk, ddl).coalesce(1) \
            .write.mode("append").parquet(src)

    stream = read_transcripts_stream(spark, src, max_files_per_trigger=1)
    sessions = stream_conversation_sessions(stream, watermark="6 hours",
                                            gap="10 minutes")
    (
        sessions.writeStream.outputMode("update")
        .format("memory").queryName("rnd_sessions")
        .option("checkpointLocation", str(tmp_path / "ckr"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(180)
    )
    got = spark.table("rnd_sessions").collect()
    by_conv = {}
    for r in got:
        by_conv.setdefault(r.conv_id, []).append(
            (r.n_turns, r.n_chars, r.first_ts, r.last_ts))

    for conv, true_sessions in want.items():
        emitted = set(by_conv[conv])
        # 1) every true session appears verbatim among the emissions
        missing = true_sessions - emitted
        assert not missing, f"{conv}: true sessions never emitted: {missing}"
        # 2) every emission is contained in exactly one true session
        for n, ch, first, last in emitted:
            hosts = [t for t in true_sessions
                     if t[2] <= first and last <= t[3]]
            assert hosts, f"{conv}: emission ({n},{ch},{first},{last}) " \
                          f"fits no true session"
            tn, tch, _, _ = hosts[0]
            assert n <= tn and ch <= tch


def test_stream_join_tool_results_batch_equivalent(spark, tmp_path):
    """The watermarked stream-stream join pairs every call with its
    in-window result and matches the batch inner join with the same
    time bound; an out-of-window result and an orphaned call never
    emit."""
    import datetime as dt

    from cow_spark.streaming.stream import stream_join_tool_results

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    calls = [("c1", "k1", "search", ts(0)),
             ("c1", "k2", "calc", ts(10)),
             ("c2", "k1", "browse", ts(20)),   # same call_id, other conv
             ("c2", "k9", "search", ts(30))]   # orphaned: no result
    results = [("c1", "k1", "ok", ts(4)),
               ("c1", "k2", "err", ts(400)),   # outside the 5m window
               ("c2", "k1", "ok", ts(21)),
               ("c3", "kX", "ok", ts(25))]     # result w/o call
    cdf = spark.createDataFrame(
        calls, "conv_id string, call_id string, tool string, "
               "ts timestamp")
    rdf = spark.createDataFrame(
        results, "conv_id string, call_id string, status string, "
                 "ts timestamp")
    csrc, rsrc = str(tmp_path / "c"), str(tmp_path / "r")
    cdf.write.parquet(csrc)
    rdf.write.parquet(rsrc)
    cs = spark.readStream.schema(cdf.schema).parquet(csrc)
    rs = spark.readStream.schema(rdf.schema).parquet(rsrc)
    joined = stream_join_tool_results(cs, rs, within="5 minutes",
                                      watermark="0 seconds")
    out = str(tmp_path / "out")
    (joined.writeStream.outputMode("append").format("parquet")
     .option("path", out)
     .option("checkpointLocation", str(tmp_path / "ck"))
     .trigger(availableNow=True).start().awaitTermination(120))
    got = sorted(
        (r.conv_id, r.call_id, r.tool, r.status, r.latency_ms)
        for r in spark.read.parquet(out).collect())
    assert got == [("c1", "k1", "search", "ok", 4000),
                   ("c2", "k1", "browse", "ok", 1000)]
