"""Distributed BPE subword training (Sennrich et al. 2016) — the
tokenizer-induction step of an LLM data pipeline, run where the data
already lives instead of funneling the corpus through a single box.

The standard trick makes this tractable at any corpus size: BPE
statistics depend only on the WORD FREQUENCY TABLE, so the corpus is
touched exactly once (tokenize → groupBy word), and every merge round
runs on the vocabulary-sized table — at 100 TB the word table is
millions of rows, not trillions.

Representation is the whole implementation: a word's symbol sequence
is one separator-framed string ``\\x1f sym \\x1f sym \\x1f`` rather
than an array. Applying merge (A, B) left-to-right non-overlapping —
the BPE rule — is then exactly one ``replace(s, \\x1fA\\x1fB\\x1f,
\\x1fAB\\x1f)``: SQL ``replace`` consumes its match and continues
scanning after the replacement in Spark, DuckDB, and Python alike, so
the oracle replays training bit-for-bit with zero higher-order
expressions in the hot path. (A list-fold formulation was tried and
rejected: DuckDB 1.0's ``list_reduce`` silently resets list-typed
struct accumulator fields.)

Pair counting follows Sennrich's reference implementation: adjacent
pairs count once per occurrence, including the overlapping ones a
single round can't both merge ("aaa" counts (a,a) twice) — identical
in the twin, and self-correcting across rounds.

Ties break deterministically by (count DESC, a ASC, b ASC) — engine
order must never decide a merge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text, tokens

SEP = "\x1f"
END_WORD = "</w>"


def word_symbol_table(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """``(cnt, s)`` — the word-frequency table with each word as a
    separator-framed character-symbol string plus the ``</w>`` end
    marker. One corpus pass: tokenize, explode, groupBy word. Words
    containing the separator byte itself are unframeable; the byte is
    stripped defensively (it is not printable text)."""
    w = (docs.select(F.explode(
            tokens(normalize_text(F.col(text_col)))).alias("w"))
         .where(F.length("w") > 0)
         .select(F.translate("w", SEP, "").alias("w"))
         .where(F.length("w") > 0)
         .groupBy("w").agg(F.count("*").alias("cnt")))
    chars = F.regexp_extract_all(F.col("w"), F.lit("."), 0)
    return w.select(
        "cnt",
        F.concat(F.lit(SEP),
                 F.array_join(chars, SEP),
                 F.lit(SEP + END_WORD + SEP)).alias("s"))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, c): adjacent symbol pair -> summed word count."""
    parts = F.filter(F.split(F.col("s"), SEP), lambda x: x != "")
    arr = words.select("cnt", parts.alias("p"))
    # guard: a fully-merged word has ONE symbol and sequence(1, 0)
    # runs DESCENDING in Spark (then element_at(p, 0) aborts under
    # ANSI); explode of the NULL branch emits no rows, which is right
    pairs = F.when(
        F.size("p") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("p") - 1),
            lambda j: F.struct(
                F.element_at(F.col("p"), j.cast("int")).alias("a"),
                F.element_at(F.col("p"), (j + 1).cast("int")).alias("b"),
            )))
    pair = arr.select("cnt", F.explode(pairs).alias("pr"))
    return pair.groupBy(F.col("pr.a").alias("a"),
                        F.col("pr.b").alias("b")) \
               .agg(F.sum("cnt").alias("c"))


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the ordered merge table
    ``(merge_idx, a, b, c)`` — the artifact a tokenizer consumes.

    Per round: one vocabulary-sized pair aggregate, ONE collected row
    (the arg-max pair — bounded by construction), one map-only
    ``replace`` over the word table, lineage cut via localCheckpoint.
    Stops early when no adjacent pair is left. The corpus itself is
    read exactly once, in :func:`word_symbol_table`.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    words = word_symbol_table(docs, text_col).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for i in range(n_merges):
        top = (_pair_counts(words)
               .orderBy(F.col("c").desc(), "a", "b").limit(1).collect())
        if not top:
            break
        a, b, c = top[0]["a"], top[0]["b"], top[0]["c"]
        merges.append((i, a, b, int(c)))
        words = words.withColumn(
            "s", F.replace(F.col("s"), F.lit(SEP + a + SEP + b + SEP),
                           F.lit(SEP + a + b + SEP))).localCheckpoint()
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "merge_idx int, a string, b string, c bigint")


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply an ordered merge list to a corpus: ``(id_col, n_tokens,
    n_subwords)`` per document — the compression diagnostic that
    validates a merge table (subwords/word falls as merges grow).

    Each merge is one ``replace`` Column stacked on the last; fine for
    the hundreds-of-merges range. A production tokenizer with a 30k+
    merge table should segment via an Arrow UDF with a real BPE loop
    instead — this path exists for exact engine-parity diagnostics,
    and raises past ``256`` merges rather than compiling a pathological
    expression tree.
    """
    if len(merges) > 256:
        raise ValueError("column-path segmentation caps at 256 merges; "
                         "use an Arrow-UDF tokenizer for real tables")
    toks = tokens(normalize_text(F.col(text_col)))
    word = F.translate(F.col("w"), SEP, "")
    chars = F.regexp_extract_all(word, F.lit("."), 0)
    s = F.concat(F.lit(SEP), F.array_join(chars, SEP),
                 F.lit(SEP + END_WORD + SEP))
    for a, b in merges:
        s = F.replace(s, F.lit(SEP + a + SEP + b + SEP),
                      F.lit(SEP + a + b + SEP))
    n_sub = F.size(F.filter(F.split(s, SEP), lambda x: x != ""))
    per_word = docs.select(
        F.col(id_col), F.explode_outer(toks).alias("w")) \
        .where(F.length(F.coalesce(F.col("w"), F.lit(""))) > 0) \
        .select(id_col, n_sub.alias("ns"))
    return (docs.select(id_col).join(
        per_word.groupBy(id_col).agg(
            F.count("*").alias("n_tokens"),
            F.sum("ns").alias("n_subwords")),
        id_col, "left")
        .select(id_col,
                F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                F.coalesce("n_subwords", F.lit(0)).alias("n_subwords")))


def bpe_train_py(word_counts: dict[str, int], n_merges: int):
    """Pure-Python twin of :func:`bpe_train` over a word->count dict."""
    words = {SEP + SEP.join(list(w) + [END_WORD]) + SEP: c
             for w, c in word_counts.items()}
    merges = []
    for i in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for s, c in words.items():
            parts = [p for p in s.split(SEP) if p]
            for x, y in zip(parts, parts[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + c
        if not counts:
            break
        (a, b), c = min(counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((i, a, b, c))
        words = {
            s.replace(SEP + a + SEP + b + SEP, SEP + a + b + SEP): cc
            for s, cc in words.items()}
    return merges


def bpe_train_oracle_sql(n_merges: int,
                         docs_table: str = "documents") -> str:
    """DuckDB twin of :func:`bpe_train`: the merge loop unrolled one
    MATERIALIZED CTE pair per round with the identical separator-framed
    ``replace``. An exhausted round leaves its top-pair CTE empty, and
    the cross join empties every later round — the same early stop the
    driver loop takes, expressed relationally."""
    sql = [
        "with toks as (",
        "  select replace(unnest(list_filter(regexp_split_to_array(",
        r"    trim(regexp_replace(lower(text), '\s+', ' ', 'g')),"
        r" '\s+'),",
        "    x -> length(x) > 0)), chr(31), '') as w",
        f"  from {docs_table}",
        "),",
        "w0 as materialized (",
        "  select count(*) as cnt,",
        "    chr(31) || array_to_string(regexp_extract_all(w, '.'),"
        " chr(31))",
        "    || chr(31) || '</w>' || chr(31) as s",
        "  from toks where length(w) > 0 group by w",
        "),",
    ]
    for i in range(n_merges):
        sql += [
            f"p{i} as (",
            "  select q.parts[j] as a, q.parts[j + 1] as b,",
            "         cast(sum(q.cnt) as bigint) as c",
            "  from (select cnt, list_filter(string_split(s, chr(31)),",
            f"        x -> x <> '') as parts from w{i}) q,",
            "       unnest(range(1, len(q.parts))) as u(j)",
            "  group by 1, 2",
            "),",
            f"t{i} as materialized (",
            f"  select {i} as merge_idx, a, b, c from p{i}",
            "  order by c desc, a, b limit 1",
            "),",
            f"w{i + 1} as materialized (",
            "  select cnt, replace(s,",
            "    chr(31) || t.a || chr(31) || t.b || chr(31),",
            f"    chr(31) || t.a || t.b || chr(31)) as s from w{i}",
            f"  cross join t{i} t",
            "),",
        ]
    # drop the trailing comma of the last CTE
    body = "\n".join(sql).rstrip()
    assert body.endswith("),")
    body = body[:-2] + ")"
    final = "\nunion all\n".join(
        f"select merge_idx, a, b, c from t{i}" for i in range(n_merges))
    return body + "\n" + final
