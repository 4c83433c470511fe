"""Term statistics and the persistent LSH dedup index."""

import os
import sys
from collections import Counter

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cow_spark.operators.dedup import (incremental_lsh_candidates,
                                       minhash_band_table, minhash_lsh_pairs,
                                       release, write_lsh_index)
from cow_spark.operators.terms import SCALE, tfidf_topk, vocabulary

_DOCS = [
    (1, "spark shuffles data between stages"),
    (2, "spark broadcasts small tables between stages"),
    (3, "duckdb replays spark queries for parity"),
    (4, "parity between engines needs portable hashing"),
    (5, ""),
]


def _py_vocab(docs, min_df=1):
    df_count: Counter = Counter()
    tf_total: Counter = Counter()
    for _, text in docs:
        toks = text.lower().split()
        tf_total.update(toks)
        df_count.update(set(toks))
    return {t: (df_count[t], tf_total[t])
            for t in df_count if df_count[t] >= min_df}


def test_vocabulary_matches_python_twin(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {r["term"]: (r["doc_freq"], r["total_tf"])
           for r in vocabulary(df, min_df=2).collect()}
    assert got == _py_vocab(_DOCS, min_df=2)
    assert "duckdb" not in got  # df=1 pruned


def test_tfidf_topk_ranks_rare_terms_first(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    rows = tfidf_topk(df, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every present doc yields exactly k rows (doc 5 is empty → absent)
    assert set(by_doc) == {1, 2, 3, 4}
    assert all(len(v) == 2 for v in by_doc.values())
    for v in by_doc.values():
        v.sort(key=lambda r: r["rank"])
        assert v[0]["score_fp"] >= v[1]["score_fp"]
        # exact fixed-point recurrence: score = tf*SCALE*n_docs // df
        for r in v:
            assert r["score_fp"] == r["tf"] * SCALE * 5 // r["doc_freq"]
    # rare terms outrank common ones; df=1 ties break alphabetically
    top1 = {d: v[0]["term"] for d, v in by_doc.items()}
    assert top1[1] == "data" and top1[3] == "duckdb"
    assert all(by_doc[d][0]["doc_freq"] == 1 for d in by_doc)


def _dup_corpus():
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, f"{base} variant {i % 3}") for i in range(30)]
    # fully token-disjoint docs: no shared shingle, so LSH can never
    # bucket them with anything (candidate = genuinely shared content)
    rows += [(100 + i, " ".join(f"tok{i}x{j}" for j in range(12)))
             for i in range(10)]
    return rows


def test_incremental_equals_batch_restricted_full_lsh(spark):
    """Candidates from (index + batch probe) == the full-corpus LSH
    pairs that involve at least one batch doc — the incremental path
    loses nothing and invents nothing."""
    rows = _dup_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    batch_ids = {r[0] for r in rows if r[0] % 4 == 0}
    index_df = minhash_band_table(df.where(~F.col("doc_id").isin(batch_ids)))
    batch = df.where(F.col("doc_id").isin(batch_ids))

    inc = incremental_lsh_candidates(batch, index_df)
    got = {tuple(sorted((r["id_new"], r["id_other"])))
           for r in inc.collect()}
    release(inc)

    full = minhash_lsh_pairs(df)
    want = {
        tuple(sorted((r["id_a"], r["id_b"]))) for r in full.collect()
        if r["id_a"] in batch_ids or r["id_b"] in batch_ids
    }
    release(full)
    assert got == want and got  # non-trivial: duplicates exist


def test_on_disk_index_roundtrip_and_pruning(spark, tmp_path):
    rows = _dup_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "lsh_index")
    bt = minhash_band_table(df.where(F.col("doc_id") % 4 != 0))
    write_lsh_index(bt, path)
    on_disk = spark.read.parquet(path)
    assert sorted(on_disk.columns) == ["band", "band_key", "doc_id"]

    batch = df.where(F.col("doc_id") % 4 == 0)
    inc_disk = incremental_lsh_candidates(batch, on_disk)
    inc_mem = incremental_lsh_candidates(batch, bt)
    got_disk = {(r["id_new"], r["id_other"]) for r in inc_disk.collect()}
    got_mem = {(r["id_new"], r["id_other"]) for r in inc_mem.collect()}
    release(inc_disk), release(inc_mem)
    assert got_disk == got_mem and got_disk

    # band partitioning actually lands on disk (pruning substrate)
    parts = {p for p in os.listdir(path) if p.startswith("band=")}
    assert len(parts) == 4


def test_index_append_maintenance(spark, tmp_path):
    """mode='append' admits a batch into the index; the next batch sees
    it (the steady-state maintenance loop)."""
    rows = _dup_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "idx")
    write_lsh_index(minhash_band_table(df.where(F.col("doc_id") < 20)), path)
    write_lsh_index(
        minhash_band_table(df.where((F.col("doc_id") >= 20)
                                    & (F.col("doc_id") < 30))),
        path, mode="append")
    cols = ["doc_id", "band", "band_key"]
    merged = spark.read.parquet(path).select(*cols)
    want = minhash_band_table(df.where(F.col("doc_id") < 30)).select(*cols)
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, want.collect())))


def test_stream_dedup_against_index(spark, tmp_path):
    """Two micro-batch generations through the on-disk index: the
    second run (a fresh query on new files, same index) must see every
    document the first run admitted — the index is the dedup state and
    survives 'restarts' by construction."""
    from cow_spark.streaming.stream import stream_dedup_against_index

    rows = _dup_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    land1, land2 = str(tmp_path / "l1"), str(tmp_path / "l2")
    df.where(F.col("doc_id") < 15).write.parquet(land1)
    df.where(F.col("doc_id") >= 15).write.parquet(land2)
    idx = str(tmp_path / "index")
    out = str(tmp_path / "admitted")

    def run(src, ck):
        stream = spark.readStream.schema("doc_id long, text string") \
            .parquet(src)
        q = stream_dedup_against_index(
            stream, idx, out, str(tmp_path / ck), available_now=True)
        q.awaitTermination(120)

    run(land1, "ck1")
    first = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    run(land2, "ck2")
    admitted = {r["doc_id"] for r in spark.read.parquet(out).collect()}

    # batch 1: the 15 near-identical docs (3 variants) collapse to the
    # min-id representative per LSH component
    assert first < admitted
    assert 0 in first and len(first) < 15
    # batch 2's copies of the variants are all rejected against the
    # index; the 10 genuinely distinct docs (100+) are admitted
    assert {100 + i for i in range(10)} <= admitted
    assert not ({r for r in admitted if 15 <= r < 30})
    # index holds band rows ONLY for admitted docs
    idx_ids = {r["doc_id"] for r in spark.read.parquet(idx).collect()}
    assert idx_ids == admitted


def test_stream_dedup_replay_after_partial_commit(spark, tmp_path):
    """Crash window: the band append landed but the output append (and
    commit marker) did not. The replayed batch must re-admit exactly
    the same docs — their own indexed bands must not drop them (the
    self-pair guard + order-aware classification) — and must not
    duplicate their band rows in the index."""
    from cow_spark.operators.dedup import minhash_band_table
    from cow_spark.streaming.stream import stream_dedup_against_index

    rows = _dup_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    land = str(tmp_path / "land")
    batch = df.where((F.col("doc_id") < 15) | (F.col("doc_id") >= 100))
    batch.write.parquet(land)
    idx = str(tmp_path / "index")
    out = str(tmp_path / "out")

    # what a clean run admits: the 15 base variants cross-bucket into
    # one component (min id 0 survives); the 10 token-disjoint docs all
    # survive. Simulate the crash: exactly those docs' bands are
    # already in the index, no output written, no marker
    survivors = {0} | {100 + i for i in range(10)}
    pre = minhash_band_table(batch.where(F.col("doc_id").isin(survivors)))
    pre.write.partitionBy("band").parquet(idx)

    stream = spark.readStream.schema("doc_id long, text string") \
        .parquet(land)
    q = stream_dedup_against_index(
        stream, idx, out, str(tmp_path / "ck"), available_now=True)
    q.awaitTermination(120)

    admitted = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert admitted == sorted(survivors)
    # band rows not duplicated by the replay
    bands = spark.read.parquet(idx).groupBy("doc_id", "band").count()
    assert bands.where(F.col("count") > 1).count() == 0


def _random_corpus(seed: int, n: int = 60):
    """Deterministic pseudo-random corpus with heavy duplication: a few
    base documents, many mutated copies."""
    import random
    rng = random.Random(seed)
    words = [f"w{j}" for j in range(40)]
    bases = [" ".join(rng.choices(words, k=15)) for _ in range(6)]
    rows = []
    for i in range(n):
        base = bases[rng.randrange(len(bases))]
        toks = base.split()
        if rng.random() < 0.5:  # mutate one token
            toks[rng.randrange(len(toks))] = rng.choice(words)
        rows.append((i, " ".join(toks)))
    return rows


def test_generational_admission_matches_python_greedy(spark):
    """Streaming the corpus through the index in generations must equal
    a serial replay of the declared admission rule over the full-corpus
    candidate graph — for ANY generation split (candidates(batch,
    index) == full pairs restricted to batch×(index∪batch) when no
    bucket caps fire). The rule is single-pass and order-free: a doc is
    dropped iff it has ANY smaller-id candidate neighbor in its own
    generation or any already-admitted neighbor — on candidate chains
    this over-drops relative to serial greedy (conservative direction
    for dedup)."""
    for seed in (7, 23):
        rows = _random_corpus(seed)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        full = minhash_lsh_pairs(df)
        pairs = {tuple(sorted((r["id_a"], r["id_b"])))
                 for r in full.collect()}
        release(full)

        # python twin of the single-pass rule, over 3 generations
        gens = [[i for i, _ in rows if i % 3 == g] for g in range(3)]
        admitted_py: set = set()
        for gen in gens:
            kept = {
                i for i in gen
                if not any(tuple(sorted((i, j))) in pairs
                           for j in admitted_py)
                and not any(j < i and tuple(sorted((i, j))) in pairs
                            for j in gen)
            }
            admitted_py |= kept

        # engine: iterate incremental_lsh_candidates over the same gens
        admitted_engine: set = set()
        index = None
        for g in range(3):
            batch = df.where(F.col("doc_id") % 3 == g)
            if index is None:
                index = spark.createDataFrame(
                    [], "doc_id long, band int, band_key string")
            cand = incremental_lsh_candidates(batch, index)
            got = cand.collect()
            release(cand)
            batch_ids = {r[0] for r in rows if r[0] % 3 == g}
            drop = set()
            for r in got:
                if r["id_other"] in batch_ids and r["id_new"] < r["id_other"]:
                    drop.add(r["id_other"])
                else:
                    drop.add(r["id_new"])
            admitted_now = batch_ids - drop
            admitted_engine |= admitted_now
            index = index.unionByName(minhash_band_table(
                df.where(F.col("doc_id").isin(admitted_now))))
        assert admitted_engine == admitted_py, seed


def test_fresh_checkpoint_with_stale_markers_fails_loudly(spark, tmp_path):
    """A recreated checkpoint at the same path would restart batch ids
    at 0 and silently skip new data against the old commit markers —
    the operator must refuse to start instead."""
    import pytest

    from cow_spark.streaming.stream import stream_dedup_against_index

    rows = _dup_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    land = str(tmp_path / "land")
    df.where(F.col("doc_id") < 10).write.parquet(land)
    idx, out, ck = (str(tmp_path / p) for p in ("idx", "out", "ck"))

    def run():
        stream = spark.readStream.schema("doc_id long, text string") \
            .parquet(land)
        return stream_dedup_against_index(stream, idx, out, ck,
                                          available_now=True)

    run().awaitTermination(120)
    # wipe the checkpoint (ops mishap), keep index + markers
    import shutil
    shutil.rmtree(ck)
    with pytest.raises(ValueError, match="fresh but commit markers"):
        run()


def _bitlen_floor_log2(x: int) -> int:
    return x.bit_length() - 1


def test_unigram_surprisal_self_matches_python(spark):
    from cow_spark.operators.terms import SCALE, unigram_surprisal
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "the the the"),
         (3, "xylophone quartz"),
         (4, ""),            # empty -> 0 tokens, NULL score
         (5, None)],         # NULL  -> same
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_tokens"], r["bits_sum"], r["score_fp"])
           for r in unigram_surprisal(docs).collect()}

    from collections import Counter
    toks = {1: "the cat sat on the mat".split(),
            2: "the the the".split(), 3: "xylophone quartz".split()}
    c = Counter(t for ts in toks.values() for t in ts)
    T = sum(c.values())
    for d, ts in toks.items():
        bits = sum(_bitlen_floor_log2(T // c[t]) for t in ts)
        assert got[d] == (len(ts), bits, bits * SCALE // len(ts)), d
    assert got[4] == (0, 0, None)
    assert got[5] == (0, 0, None)
    # the common-word doc is less surprising than the rare-word doc
    assert got[2][2] < got[3][2]


def test_unigram_surprisal_reference_model(spark):
    from cow_spark.operators.terms import SCALE, unigram_surprisal
    docs = spark.createDataFrame(
        [(1, "the cat"), (2, "zorp zorp")],
        "doc_id long, text string",
    )
    model = spark.createDataFrame(
        [("the", 90), ("cat", 9), ("dog", 1)], "term string, count long")
    got = {r["doc_id"]: (r["n_tokens"], r["bits_sum"], r["score_fp"])
           for r in unigram_surprisal(docs, model=model).collect()}
    TV = 100 + 3  # total + vocab (add-one smoothing)
    b = {"the": _bitlen_floor_log2(TV // 91),
         "cat": _bitlen_floor_log2(TV // 10),
         "zorp": _bitlen_floor_log2(TV // 1)}
    assert got[1] == (2, b["the"] + b["cat"],
                      (b["the"] + b["cat"]) * SCALE // 2)
    assert got[2] == (2, 2 * b["zorp"], b["zorp"] * SCALE)
    assert got[2][2] > got[1][2]  # OOV gibberish scores higher


def test_bigram_surprisal_self_matches_python(spark):
    from cow_spark.operators.terms import SCALE, bigram_surprisal
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "the cat sat again today"),
         (3, "one two one two one two"),   # formulaic: repeated bigrams
         (4, "solo"),                      # 1 token -> no bigrams
         (5, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["bits_sum"], r["score_fp"])
           for r in bigram_surprisal(docs).collect()}

    from collections import Counter
    texts = {1: "the cat sat on the mat", 2: "the cat sat again today",
             3: "one two one two one two"}
    bgs = {d: list(zip(t.split(), t.split()[1:])) for d, t in texts.items()}
    c2 = Counter(b for bs in bgs.values() for b in bs)
    c1 = Counter(b[0] for bs in bgs.values() for b in bs)
    for d, bs in bgs.items():
        bits = sum(_bitlen_floor_log2(c1[w1] // c2[(w1, w2)])
                   for w1, w2 in bs)
        assert got[d] == (len(bs), bits, bits * SCALE // len(bs)), d
    assert got[4] == (0, 0, None)
    assert got[5] == (0, 0, None)
    # the formulaic doc is the most predictable transition-wise
    assert got[3][2] <= min(got[1][2], got[2][2])


def test_surprisal_buckets_partition(spark):
    from cow_spark.operators.terms import surprisal_buckets
    # 9 scored docs with distinct score profiles + 1 unscored
    rows = [(i, " ".join(["common"] * 5 + [f"rare{i}"] * i))
            for i in range(1, 10)] + [(10, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["score_fp"], r["bucket"])
           for r in surprisal_buckets(df).collect()}
    assert got[10] == (None, "unscored")
    scored = sorted((v[0], k) for k, v in got.items() if k != 10)
    buckets = [got[k][1] for _, k in scored]
    # ordered by score the buckets must be monotone head->middle->tail
    order = {"head": 0, "middle": 1, "tail": 2}
    assert all(order[a] <= order[b] for a, b in zip(buckets, buckets[1:]))
    assert buckets[0] == "head" and buckets[-1] == "tail"
    # exact thirds: percentile_disc(1/3) of 9 values is the 3rd
    n_head = sum(b == "head" for b in buckets)
    assert n_head == sum(1 for s, _ in scored if s <= scored[2][0])


def test_log2_fp_kernel_matches_python_twin(spark):
    """The mantissa-squaring log2 kernel: Spark == python twin exactly,
    and both within 1/1024 bit of the mathematical floor."""
    import math

    from cow_spark.functions.intmath import log2_fp_py, with_log2_fp

    vals = [1, 2, 3, 5, 7, 10, 63, 64, 65, 999, 12345, 2**31 - 1,
            2**40 + 7, 2**62 - 1]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r.v: r.l for r in with_log2_fp(df, "v", "l").collect()}
    for v in vals:
        assert got[v] == log2_fp_py(v), v
        assert abs(got[v] - math.floor(1024 * math.log2(v))) <= 1, v


def test_bm25_scores_match_python_twin(spark):
    from cow_spark.functions.intmath import log2_fp_py
    from cow_spark.operators.terms import bm25_scores

    texts = {
        1: "spark join engine join join performance",
        2: "window functions and the join planner",
        3: "totally unrelated prose about cooking pasta",
        4: "join",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r.doc_id: (r.n_hits, r.score_fp)
           for r in bm25_scores(df, ["join", "window"]).collect()}

    N = len(texts)
    toks = {d: t.split() for d, t in texts.items()}
    T = sum(len(t) for t in toks.values())
    for q in ("join", "window"):
        pass
    want = {}
    for d, t in toks.items():
        score, hits = 0, 0
        for q in ("join", "window"):
            tf = t.count(q)
            if not tf:
                continue
            hits += 1
            df_t = sum(1 for tt in toks.values() if q in tt)
            idf = max(log2_fp_py(2 * N - 2 * df_t + 1)
                      - log2_fp_py(2 * df_t + 1), 0)
            denom_h = 100 - 75 + (75 * len(t) * N) // T
            tfsat = (tf * 220 * 1000) // (tf * 100 + (120 * denom_h) // 100)
            score += (idf * tfsat) // 1000
        if hits:
            want[d] = (hits, score)
    assert got == want
    assert 3 not in got                 # no query terms -> no row
    # 'join' is in 3 of 4 docs: Robertson idf goes negative and floors
    # to 0, so the common term scores nothing — the doc holding the
    # rare term 'window' outranks the join-heavy doc
    assert got[1][1] == 0 and got[2][1] > 0


def test_rrf_fuse_semantics(spark):
    import pytest

    from cow_spark.operators.simsearch import rrf_fuse

    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)],
                              "doc_id long, rank int")
    b = spark.createDataFrame([(11, 1), (13, 2)], "doc_id long, rank int")
    got = {r.doc_id: (r.n_lists, r.rrf_fp)
           for r in rrf_fuse([a, b]).collect()}
    S = 1_000_000
    assert got == {
        10: (1, S // 61), 11: (2, S // 62 + S // 61),
        12: (1, S // 63), 13: (1, S // 62),
    }
    assert max(got, key=lambda d: got[d][1]) == 11  # in both lists -> wins
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_collocations_pmi(spark):
    """PMI collocations: the glued pair outranks frequent-but-independent
    pairs, hapax pairs are suppressed, and the python-twin formula holds
    exactly."""
    import pytest

    from cow_spark.functions.intmath import log2_fp_py
    from cow_spark.operators.terms import collocations

    rows = []
    # 'hong kong' ONLY ever together (20x); every other word also
    # occurs independently, so its pairs lose PMI; 'rare gem' only
    # twice (below min_count)
    for i in range(20):
        rows.append((i, "hong kong is the place with the data today"))
    for i in range(10):
        rows.append((200 + i, "data systems now"))
        rows.append((300 + i, "later today is fine with the place"))
    rows.append((100, "rare gem")), rows.append((101, "rare gem"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = collocations(df, min_count=3, k=10).collect()
    pairs = [(r.w1, r.w2) for r in got]
    # exclusive pairs outrank pairs whose words also occur apart —
    # and the rarer exclusive pair ranks highest (PMI's signature)
    assert pairs.index(("systems", "now")) < pairs.index(("hong", "kong"))
    assert pairs.index(("hong", "kong")) < pairs.index(("data", "today"))
    assert ("rare", "gem") not in pairs  # min_count suppressed

    # exact twin for the top pair
    toks = [t for _, txt in rows for t in txt.split()]
    bgs = [b for _, txt in rows
           for b in zip(txt.split(), txt.split()[1:])]
    from collections import Counter
    cu, cb = Counter(toks), Counter(bgs)
    t1, t2 = len(toks), len(bgs)
    want = (log2_fp_py(cb[("hong", "kong")]) - log2_fp_py(cu["hong"])
            - log2_fp_py(cu["kong"]) + 2 * log2_fp_py(t1)
            - log2_fp_py(t2))
    hk = next(r for r in got if (r.w1, r.w2) == ("hong", "kong"))
    assert hk.pmi_fp == want

    with pytest.raises(ValueError, match="non-empty"):
        collocations(spark.createDataFrame([], "doc_id long, text string"))


def test_surprisal_windows_localizes_garbage(spark):
    """A good document with an injected garbage span: the worst window
    is the one holding the garbage, even though the doc-level mean
    would dilute it."""
    from cow_spark.operators.dedup import release
    from cow_spark.operators.terms import surprisal_windows

    good = "the data engine joins tables and the planner sorts rows"  # common
    garbage = "zxq vvk jjw qqp mmx ccz bbn llr kkt hhy"               # hapax
    rows = [(i, " ".join([good] * 4)) for i in range(10)]
    # doc 99: three good windows then the garbage in window 3
    rows.append((99, " ".join([good] * 3) + " " + garbage))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = surprisal_windows(df, window=10)
    got = {r.doc_id: r for r in out.collect()}
    assert release(out) == 1
    # clean docs: all windows identical, tie breaks to window 0
    assert got[0].worst_idx == 0
    # the garbage span is localized (40 tokens -> windows 0..3; the
    # hapax tokens live in window 3)
    assert got[99].worst_idx == 3
    assert got[99].worst_fp > got[0].worst_fp


def test_vocab_growth_checkpoints(spark):
    """First-occurrence formulation: cumulative docs/tokens/types per
    inclusive threshold, saturated tail beyond max id, ttr floor;
    empty thresholds raise."""
    import pytest

    from cow_spark.operators.terms import vocab_growth

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (5, "c d d")],
        "doc_id long, text string")
    got = {r.threshold: r for r in
           vocab_growth(docs, [1, 2, 100]).collect()}
    t1 = got[1]
    assert (t1.n_docs, t1.n_tokens, t1.n_types) == (1, 3, 2)
    assert t1.ttr_ppm == 666666
    t2 = got[2]
    assert (t2.n_docs, t2.n_tokens, t2.n_types) == (2, 5, 3)
    t100 = got[100]
    assert (t100.n_docs, t100.n_tokens, t100.n_types) == (3, 8, 4)
    assert t100.ttr_ppm == 500000
    with pytest.raises(ValueError):
        vocab_growth(docs, [])


def test_zipf_alpha_matches_serial_twin(spark):
    """Bit-exact vs a Python twin of the same two-floor MLE; xmin
    filter; no-qualifying-terms yields zero rows; xmin<1 raises."""
    import pytest

    from cow_spark.functions.intmath import log2_fp_py
    from cow_spark.operators.terms import LN2_PPM, zipf_alpha

    # term frequencies: a=5 b=3 c=3 d=1 (d below xmin=3)
    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a a b c c d")],
        "doc_id long, text string")
    [row] = zipf_alpha(docs, xmin=3).collect()
    base = log2_fp_py(5)
    s_fp = sum(log2_fp_py(2 * f) - base for f in (5, 3, 3))
    bits = (3 * 1024 * 1_000_000) // s_fp
    assert (row.n_terms, row.s_fp) == (3, s_fp)
    assert row.alpha_ppm == 1_000_000 + (bits * 1_000_000) // LN2_PPM
    assert zipf_alpha(docs, xmin=10).count() == 0
    with pytest.raises(ValueError):
        zipf_alpha(docs, xmin=0)


def _kn_py(texts, d_ppm=750_000):
    """Serial twin of kneser_ney_surprisal's ppm/log2 arithmetic."""
    from cow_spark.functions.intmath import log2_fp_py

    s = 1_000_000
    toks = {i: t.lower().split() for i, t in texts}
    tf: dict = {}
    for i, t in toks.items():
        for a, b in zip(t, t[1:]):
            tf[(i, a, b)] = tf.get((i, a, b), 0) + 1
    c2: dict = {}
    for (i, a, b), n in tf.items():
        c2[(a, b)] = c2.get((a, b), 0) + n
    c1: dict = {}
    n1r: dict = {}
    n1l: dict = {}
    for (a, b), n in c2.items():
        c1[a] = c1.get(a, 0) + n
        n1r[a] = n1r.get(a, 0) + 1
        n1l[b] = n1l.get(b, 0) + 1
    nn = len(c2)
    log2_s = log2_fp_py(s)
    out = {}
    for i, t in toks.items():
        nb = bits = 0
        for a, b in zip(t, t[1:]):
            term1 = max(c2[(a, b)] * s - d_ppm, 0) // c1[a]
            lam = (d_ppm * n1r[a]) // c1[a]
            pc = (n1l[b] * s) // nn
            p = max(1, term1 + (lam * pc) // s)
            assert p <= s  # proper distribution, floors only shrink
            nb += 1
            bits += log2_s - log2_fp_py(p)
        out[i] = (nb, bits, bits // nb if nb else None)
    return out


def test_kneser_ney_matches_serial_twin(spark):
    from cow_spark.operators.terms import kneser_ney_surprisal

    texts = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "a cat and a dog"),
        (4, "the the the the"),
        (5, "solo"),  # no bigram: n=0, NULL score
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.kn_bits_fp, r.score_fp)
           for r in kneser_ney_surprisal(docs).collect()}
    exp = _kn_py(texts)
    exp[5] = (0, 0, None)
    assert got == exp


def test_kneser_ney_smooths_rare_bigrams(spark):
    """The discount moves mass off frequent bigrams: a once-seen
    bigram with a promiscuous head scores HIGHER surprisal than the
    head's dominant continuation — and both probabilities stay in
    (0, 1] (bits_fp >= 0)."""
    from cow_spark.operators.terms import kneser_ney_surprisal

    docs = spark.createDataFrame(
        [(i, "go home") for i in range(9)] + [(100, "go away")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in kneser_ney_surprisal(docs).collect()}
    assert rows[100].score_fp > rows[0].score_fp  # rare continuation
    assert all(r.kn_bits_fp >= 0 for r in rows.values())


def test_textrank_hub_word_wins(spark):
    """A word adjacent to every other word collects the most rank;
    degree-1 satellites tie below it."""
    from cow_spark.operators.terms import textrank_keywords

    docs = spark.createDataFrame(
        [(1, "hub alpha hub beta hub gamma")],
        "doc_id long, text string")
    rows = sorted(textrank_keywords(docs).collect(),
                  key=lambda r: -r.rank_fp)
    assert rows[0].node == "hub"
    sats = {r.rank_fp for r in rows[1:]}
    assert len(sats) == 1  # alpha/beta/gamma structurally identical


def test_textrank_self_pairs_dropped(spark):
    """Repeated tokens ('the the') must not self-loop; a two-word
    doc yields exactly its two nodes."""
    from cow_spark.operators.terms import textrank_keywords

    docs = spark.createDataFrame(
        [(1, "the the cat")], "doc_id long, text string")
    nodes = {r.node for r in textrank_keywords(docs).collect()}
    assert nodes == {"the", "cat"}


def test_vocab_richness_hand_values(spark):
    """15 tokens / 11 types, f1=8, f2=2 → chao1 = 11 + 8·7//6 = 20,
    Good-Turing unseen = 8e6//15; empty corpus hits the zero
    convention with coverage 10^6."""
    from cow_spark.operators.terms import vocab_richness

    docs = [(1, "the cat sat on the mat"), (2, "the cat ran"),
            (3, "a  b\tb c   "), (4, "solo"), (5, ""), (6, "x")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    assert [tuple(r) for r in vocab_richness(df).collect()] == [
        (15, 11, 8, 2, 20, 533_333, 466_667)]
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert [tuple(r) for r in vocab_richness(empty).collect()] == [
        (0, 0, 0, 0, 0, 0, 1_000_000)]


def test_distinct_ngrams_within_doc_bigrams_only(spark):
    """Bigrams never span documents: two one-token docs in a slice
    yield distinct2 = 0 (zero-denominator convention), while the
    same tokens in ONE doc yield a bigram."""
    from cow_spark.operators.terms import distinct_ngrams

    split = [(1, "aa", "s"), (2, "bb", "s")]
    joined = [(1, "aa bb", "j")]
    df = spark.createDataFrame(split + joined,
                               "doc_id long, text string, g string")
    got = {r.slice: r for r in distinct_ngrams(df, "g").collect()}
    assert (got["s"].n_bigrams, got["s"].distinct2_ppm) == (0, 0)
    assert (got["j"].n_bigrams, got["j"].types2,
            got["j"].distinct2_ppm) == (1, 1, 1_000_000)
    # repeated phrase collapses distinct-2
    rep = spark.createDataFrame(
        [(1, "go home go home go home", "r")],
        "doc_id long, text string, g string")
    r = distinct_ngrams(rep, "g").collect()[0]
    # bigrams: go-home ×3, home-go ×2 → 5 occurrences, 2 types
    assert (r.n_bigrams, r.types2, r.distinct2_ppm) == (5, 2, 400_000)
