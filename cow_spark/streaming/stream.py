"""Structured Streaming ingestion: transcripts stream → quads stream.

The reference is a batch file converter (no streaming, SURVEY.md §2.7);
this is the engine extension for continuously-landing transcript data.
The extraction plan is stateless (projection + explode + filter), so the
same compiled rules run unchanged on a streaming DataFrame; global dedup
is replaced by a watermarked ``dropDuplicates`` on the quad key within
the lateness horizon (exact global dedup across unbounded streams is
done downstream at compaction, e.g. an Iceberg MERGE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..model import QUAD_COLS
from ..operators.extract import extract_quads
from ..spec.mapping import MappingSpec

TRANSCRIPTS_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def read_transcripts_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """File-source stream over landing parquet (swap for Kafka/Iceberg
    incremental reads in production — the downstream plan is identical)."""
    return (
        spark.readStream.schema(TRANSCRIPTS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_extract_quads(
    stream: DataFrame,
    spec: MappingSpec,
    graph: str | None = None,
    watermark: str = "10 minutes",
    event_time_col: str = "ts",
) -> DataFrame:
    """Streaming extraction with within-watermark dedup.

    ``dropDuplicatesWithinWatermark`` dedups on the quad key ALONE within
    the lateness horizon (state dropped beyond the watermark) — a plain
    ``dropDuplicates(key + ts)`` would keep identical quads emitted by
    turns at different event times, diverging from batch
    ``dedup='global'`` semantics.
    """
    with_wm = stream.withWatermark(event_time_col, watermark)
    quads = extract_quads(with_wm, spec, graph=graph, dedup="none",
                          passthrough=[event_time_col])
    return quads.dropDuplicatesWithinWatermark(QUAD_COLS)


def stream_dedup_documents(
    stream: DataFrame,
    text_col: str = "text",
    watermark: str = "10 minutes",
    event_time_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: one surviving row per normalized-text
    fingerprint within the lateness horizon (the streaming face of
    :func:`..operators.dedup.exact_duplicates`).

    State is one key per *distinct* document inside the watermark
    window, dropped as the watermark passes — bounded by the dedup
    horizon, not the stream's history. Exact global dedup across the
    unbounded stream belongs downstream at compaction (Iceberg MERGE),
    same policy as :func:`stream_extract_quads`.
    """
    from ..functions.text import fingerprint

    wm = stream.withWatermark(event_time_col, watermark)
    # NULL text has no fingerprint; those rows must pass through
    # un-deduped (the batch operator never groups NULLs). A two-branch
    # union would re-scan the unbounded source once per branch per
    # trigger (no CSE across union branches — CLAUDE.md), so instead
    # NULL rows get a unique key: they can never collide, and their
    # state entries age out with the watermark like any other key.
    key = F.coalesce(fingerprint(F.col(text_col)), F.expr("uuid()"))
    return (
        wm.withColumn("_fp", key)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )


def stream_mention_rates(
    stream: DataFrame,
    pattern: str,
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked windowed aggregation: mention counts per (window,
    surface form) over the transcript stream — the late-data-bounded
    monitoring view of E1."""
    with_wm = stream.withWatermark("ts", watermark)
    m = with_wm.select(
        "conv_id", "turn_idx", "ts",
        F.explode(F.regexp_extract_all(F.col("text"), F.lit(pattern), 0)
                  ).alias("mention"),
    )
    return (
        m.groupBy(F.window("ts", window).alias("w"), F.col("mention"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "mention", "n")
    )


SESSION_OUTPUT_DDL = (
    "conv_id string, n_turns bigint, n_chars bigint, "
    "first_ts timestamp, last_ts timestamp, closed boolean"
)
# parallel arrays: one entry per open candidate sub-session (kept until
# the watermark proves no late event can bridge them)
_SESSION_STATE_DDL = (
    "ns array<bigint>, chs array<bigint>, "
    "firsts array<bigint>, lasts array<bigint>"
)


def stream_conversation_sessions(
    stream: DataFrame,
    watermark: str = "10 minutes",
    gap: str = "30 minutes",
) -> DataFrame:
    """Custom stateful operator: event-time session windows per
    conversation via ``applyInPandasWithState``.

    True session-window semantics: turns more than ``gap`` apart in
    *event time* belong to different sessions — whether the gap shows up
    inside one pandas batch, between micro-batches, or only as silence
    (the event-time timeout one gap past the last turn closes the final
    session and drops the state). Each update emits the running summary
    (``closed=false``); a session emits ``closed=true`` exactly once.
    This is the engine's template for stateful ops the built-in
    operators can't express (the reference has no streaming, SURVEY §2.7).

    Arrow-batched per group; state is a single tiny tuple per live
    conversation, so memory tracks *active* conversations, not history.
    Event times are treated as UTC — ``get_session`` pins the session
    timezone to UTC; tz-aware pandas values are converted defensively
    (GroupState's watermark/timeout clock is true epoch ms).
    """
    import pandas as pd  # noqa: F811 (executor-side import)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = _duration_ms(gap)

    def _row(conv_id, n_turns, n_chars, first_us, last_us, closed):
        return pd.DataFrame({
            "conv_id": [conv_id], "n_turns": [n_turns], "n_chars": [n_chars],
            "first_ts": [pd.Timestamp(first_us, unit="us")],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
            "closed": [closed],
        })

    def assemble(key, pdfs, state: GroupState):
        (conv_id,) = key

        # candidates: [n_turns, n_chars, first_us, last_us] per open
        # sub-session, sorted by first_us
        if state.exists:
            ns, chs, firsts, lasts = state.get
            cands = [list(t) for t in zip(ns, chs, firsts, lasts)]
        else:
            cands = []

        if not state.hasTimedOut:
            # sessionize this batch's events and merge into candidates
            parts = []
            for pdf in pdfs:
                ts = pdf["ts"]
                if getattr(ts.dtype, "tz", None) is not None:
                    ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
                parts.append(pd.DataFrame({
                    "us": ts.astype("int64") // 1000,
                    "ch": pdf["text"].fillna("").str.len().astype("int64"),
                }))
            if parts:
                batch = pd.concat(parts).sort_values("us")
                new_sess = batch["us"].diff() > gap_ms * 1000
                for _, grp in batch.groupby(new_sess.cumsum()):
                    cands.append([len(grp), int(grp["ch"].sum()),
                                  int(grp["us"].iloc[0]),
                                  int(grp["us"].iloc[-1])])
                # interval-merge within gap: summaries only ever merge
                # (a session never re-splits once events are within gap),
                # so candidate compression is lossless for these aggs
                cands.sort(key=lambda c: c[2])
                merged = []
                for c in cands:
                    if merged and c[2] - merged[-1][3] <= gap_ms * 1000:
                        m = merged[-1]
                        m[0] += c[0]
                        m[1] += c[1]
                        m[3] = max(m[3], c[3])
                    else:
                        merged.append(c)
                cands = merged

        # close only what the watermark proves final: no event ≥ the
        # watermark can be within gap of the candidate's last turn.
        # (Closing on an *observed* gap would be wrong — a late-but-
        # within-watermark event may still arrive and bridge it.)
        wm_us = state.getCurrentWatermarkMs() * 1000
        still_open = []
        for c in cands:
            if c[3] + gap_ms * 1000 < wm_us:
                yield _row(conv_id, *c, True)
            else:
                still_open.append(c)

        if not still_open:
            if state.exists:
                state.remove()
            return
        state.update((
            [c[0] for c in still_open], [c[1] for c in still_open],
            [c[2] for c in still_open], [c[3] for c in still_open],
        ))
        # wake at the earliest possible closure; never before the
        # current watermark (setting an earlier timeout is invalid)
        earliest_close = min(c[3] for c in still_open) // 1000 + gap_ms
        state.setTimeoutTimestamp(
            max(earliest_close, state.getCurrentWatermarkMs() + 1))
        for c in still_open:
            yield _row(conv_id, *c, False)

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            assemble,
            outputStructType=SESSION_OUTPUT_DDL,
            stateStructType=_SESSION_STATE_DDL,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


_UNIT_MS = {
    "millisecond": 1, "milliseconds": 1, "ms": 1,
    "second": 1000, "seconds": 1000, "sec": 1000, "secs": 1000, "s": 1000,
    "minute": 60_000, "minutes": 60_000, "min": 60_000, "mins": 60_000,
    "hour": 3_600_000, "hours": 3_600_000, "h": 3_600_000,
    "day": 86_400_000, "days": 86_400_000, "d": 86_400_000,
    "week": 604_800_000, "weeks": 604_800_000,
}


def _duration_ms(s: str) -> int:
    """Spark-interval-style duration grammar, incl. multi-part and
    fractional values ('1 hour 30 minutes', '1.5 hours') — matches what
    ``withWatermark`` accepts. The whole string must be consumed; a
    partial match ('1.5' parsed as '5') would silently change the gap."""
    import re as _re

    if not _re.fullmatch(r"\s*(?:\d+(?:\.\d+)?\s*[A-Za-z]+\s*)+", s):
        raise ValueError(f"cannot parse duration {s!r}")
    total = 0.0
    for n, unit in _re.findall(r"(\d+(?:\.\d+)?)\s*([A-Za-z]+)", s):
        try:
            total += float(n) * _UNIT_MS[unit.lower()]
        except KeyError:
            raise ValueError(f"unknown duration unit {unit!r} in {s!r}")
    return int(total)


def write_quads_stream(
    quads: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = False,
):
    """Append sink; availableNow=True drains the backlog then stops
    (used by tests; production runs continuous triggers)."""
    w = (
        quads.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_dedup_against_index(
    stream: DataFrame,
    index_path: str,
    output_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = False,
):
    """Continuous-ingest near-dup gate: each micro-batch probes the
    persistent on-disk LSH index (``minhash_band_table`` layout,
    band-partitioned), admits only non-candidate documents, and appends
    the admitted documents' band rows back to the index — so the next
    batch (or a restarted job) sees everything admitted so far. The
    index IS the dedup state: unbounded-corpus memory lives on disk,
    not in executor state stores, and survives restarts for free.

    Admission is a single-pass, order-free rule on LSH candidates: a
    batch doc is dropped iff it shares a bucket with any indexed doc,
    or with ANY smaller-id doc of the same batch. On candidate CHAINS
    (a<b<c with pairs a-b, b-c only) this drops c where a serial greedy
    scan would re-admit it — deliberately: over-dropping borderline
    members of a near-dup chain is the conservative direction for
    dedup, and the rule needs no within-batch ordering, so the batch
    can be arbitrarily parallel. ACROSS batches, arrival order decides
    which near-dup representative survives (earlier batches win) — a
    file source orders batches by modification time, so re-landing the
    same files with different mtimes can admit a different, equally
    valid representative per group. Candidates are *probable*
    near-dups — a Jaccard-verified pass belongs downstream at
    compaction where the full text store is available, same policy as
    :func:`stream_dedup_documents` / `stream_extract_quads`.

    foreachBatch rather than a stateful operator because the state is
    a corpus-scale TABLE (band rows per admitted doc) — state-store
    APIs bound state per key, not per corpus; a disk-backed index with
    broadcast probes is the shape that survives 100 TB.

    Restart semantics: a commit marker per batch id
    (``<index>/_commits/<id>``, written last) makes a fully-committed
    batch a no-op on replay; a crash mid-batch replays it, where the
    self-pair guard in :func:`..operators.dedup.incremental_lsh_candidates`
    plus a replay-safe band append (already-indexed ids skipped) keep
    the index exact. The one remaining at-least-once window — a crash
    between the output append and the marker — can duplicate OUTPUT
    rows only (never index rows); plain parquet appends cannot close
    it, an ACID table format (Iceberg MERGE) at the sink can, same
    policy as the compaction note above.
    """
    from ..operators.dedup import (incremental_lsh_candidates,
                                   minhash_band_table, release)

    import hashlib

    # batch ids are per-QUERY (they restart at 0 for a new checkpoint
    # location), but the index is shared across queries — the marker
    # key must carry the query identity or a later query's batch 0
    # would be mistaken for an already-committed one
    query_key = hashlib.md5(checkpoint.encode()).hexdigest()[:12]

    # a FRESH checkpoint (no offsets yet) restarts batch ids at 0; if
    # markers for this checkpoint path already exist, batch 0 would be
    # mistaken for committed and silently skipped — new data lost. Fail
    # loudly instead: the operator must clear the stale markers or pick
    # a new checkpoint location.
    spark0 = stream.sparkSession
    _jvm = spark0._jvm
    _hconf = spark0._jsc.hadoopConfiguration()
    _off = _jvm.org.apache.hadoop.fs.Path(f"{checkpoint}/offsets")
    _cfs = _off.getFileSystem(_hconf)
    _mark0 = _jvm.org.apache.hadoop.fs.Path(
        f"{index_path}/_commits/{query_key}-0")
    if not _cfs.exists(_off) and _mark0.getFileSystem(_hconf).exists(_mark0):
        raise ValueError(
            f"checkpoint {checkpoint!r} is fresh but commit markers for it "
            f"exist under {index_path}/_commits — a recreated checkpoint "
            "would silently skip batch 0. Remove the stale "
            f"'{query_key}-*' markers or use a new checkpoint location.")

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        marker = jvm.org.apache.hadoop.fs.Path(
            f"{index_path}/_commits/{query_key}-{batch_id}")
        fs = marker.getFileSystem(hconf)
        if fs.exists(marker):  # batch fully committed before a restart
            return
        batch = batch.persist()
        pairs = adm_bands = admitted = None
        try:
            # probe through the same FS handle (works on any cluster
            # filesystem) instead of catching read errors — also avoids
            # Spark's noisy missing-path WARN on the very first batch
            idx_dir = jvm.org.apache.hadoop.fs.Path(index_path)
            idx = None
            if fs.exists(idx_dir):
                try:
                    idx = spark.read.parquet(index_path)
                except Exception as e:
                    # a batch that admitted only unsignable (empty-text)
                    # docs appends zero rows: directory exists, no
                    # parquet footer → same treatment as resume.py
                    if not ("UNABLE_TO_INFER_SCHEMA" in str(e)
                            or "Unable to infer schema" in str(e)):
                        raise
            if idx is None:
                # first batch: only within-batch dedup; id type follows
                # the stream's schema
                id_type = batch.schema[id_col].dataType.simpleString()
                idx = spark.createDataFrame(
                    [], f"doc_id {id_type}, band int, band_key string")
            pairs = incremental_lsh_candidates(batch, idx, id_col, text_col)
            batch_ids = batch.select(F.col(id_col).alias("_bid"))
            # within-batch pairs have id_new < id_other AND id_other in
            # the batch (drop the larger); everything else is a
            # vs-index pair (drop the batch side, id_new). The order
            # test matters on replay: an already-indexed batch doc's
            # index rows produce vs-index pairs whose id_other IS a
            # batch member — membership alone would mis-drop the
            # smaller (previously admitted) doc.
            flagged = pairs.join(
                batch_ids, pairs["id_other"] == batch_ids["_bid"], "left")
            drop = (flagged.select(
                F.when(F.col("_bid").isNotNull()
                       & (F.col("id_new") < F.col("id_other")),
                       F.col("id_other"))
                .otherwise(F.col("id_new")).alias("_did"))
                .distinct())
            admitted = batch.join(
                drop, batch[id_col] == drop["_did"], "left_anti").persist()
            # index first, output second: if the band append lands and
            # the process dies, the replay re-admits the same docs (the
            # self-pair guard ignores their own indexed bands) and the
            # anti-join below skips re-appending them — index stays
            # exact and the output is written exactly once for THAT
            # window
            adm_bands = minhash_band_table(
                admitted, id_col, text_col).persist()
            already = (
                idx.join(F.broadcast(adm_bands.select("band", "band_key")
                                     .distinct()),
                         ["band", "band_key"])
                .select("doc_id", "band", "band_key")
            )  # batch-bounded: only buckets the admitted docs touch
            # anti-join at ROW granularity, not doc granularity: a crash
            # mid-append can leave some of a doc's band rows visible
            # (task commits are not atomic as a set); a doc-level skip
            # would then lose the doc's remaining bands forever
            adm_bands.join(F.broadcast(already),
                           ["doc_id", "band", "band_key"], "left_anti") \
                .write.mode("append").partitionBy("band").parquet(index_path)
            admitted.write.mode("append").parquet(output_path)
            fs.create(marker, True).close()
        finally:
            # cleanup runs on error paths too — foreachBatch retries
            # would otherwise accumulate orphaned cached tables
            if pairs is not None:
                release(pairs)
            for h in (adm_bands, admitted):
                if h is not None:
                    h.unpersist()
            batch.unpersist()

    w = (stream.writeStream.outputMode("update")
         .foreachBatch(_process)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_join_tool_results(
    calls: DataFrame,
    results: DataFrame,
    within: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join: pair each tool CALL with its RESULT
    arriving within ``within`` of the call — the live face of the
    batch :func:`~cow_spark.operators.asof.asof_join` for agent
    telemetry (latency dashboards, orphaned-call alarms feed off the
    same state). Schemas: calls ``(conv_id, call_id, tool, ts)``,
    results ``(conv_id, call_id, status, ts)``.

    The mechanics Structured Streaming REQUIRES, stated explicitly
    because each omission silently grows state forever: BOTH sides
    carry a watermark, and the join condition bounds result time in
    BOTH directions relative to call time (``[call_ts, call_ts +
    within]``) — that pair of bounds is what lets the engine expire
    call state at ``watermark + within`` and result state at
    ``watermark``. Equality keys (conv_id, call_id) shuffle both
    streams to the same tasks; state per task is horizon-bounded.

    Inner join by design: an unmatched call is ABSENT here, not
    NULL-padded — outer stream-stream joins emit the NULL row only
    after the watermark closes, which turns a latency feed into a
    lagging one; the orphan alarm is a separate left-outer consumer.
    Returns ``(conv_id, call_id, tool, status, call_ts, result_ts,
    latency_ms)``.
    """
    c = (calls.withWatermark("ts", watermark)
         .select("conv_id", "call_id", "tool",
                 F.col("ts").alias("call_ts")))
    r = (results.withWatermark("ts", watermark)
         .select(F.col("conv_id").alias("r_conv"),
                 F.col("call_id").alias("r_call"), "status",
                 F.col("ts").alias("result_ts")))
    within_ms = _duration_ms(within)
    cond = ((c.conv_id == r.r_conv) & (c.call_id == r.r_call)
            & (r.result_ts >= c.call_ts)
            & (r.result_ts <= c.call_ts
               + F.expr(f"interval {within_ms} milliseconds")))
    j = c.join(r, cond, "inner")
    return j.select(
        "conv_id", "call_id", "tool", "status", "call_ts", "result_ts",
        ((F.unix_micros(F.col("result_ts").cast("timestamp"))
          - F.unix_micros(F.col("call_ts").cast("timestamp")))
         / 1000).cast("long").alias("latency_ms"))
