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


def bpe_segment_arrow(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The production-scale twin of :func:`bpe_segment`: same
    ``(id_col, n_tokens, n_subwords)`` contract and the IDENTICAL
    sequential-replace semantics (each merge applied to completion,
    left-to-right non-overlapping, in table order), but the merge loop
    runs inside an Arrow ``mapInPandas`` kernel instead of a stacked
    Column expression — no 256-merge cap, so a real 30k-merge
    tokenizer table fits. Map-only: zero shuffle, the merge table
    rides the closure (a 30k-pair list is ~1 MB — broadcast-by-
    pickle is fine at any executor count).

    Per batch the distinct-word vocabulary is segmented once and
    reused (corpus tokens >> vocabulary); a symbol-set guard skips
    merges whose parts cannot occur in the word, so the common case
    is ~|merges| set probes per distinct word, not |merges| scans.
    ``tests/test_subword.py`` pins equality with the Column path.
    """
    import re

    from pyspark.sql.types import LongType, StructField, StructType

    id_field = docs.schema[id_col]
    out_schema = StructType([
        StructField(id_col, id_field.dataType, True),
        StructField("n_tokens", LongType(), False),
        StructField("n_subwords", LongType(), False),
    ])
    # Explicit class, not \s: Python's \s is unicode-aware where
    # Java's default is not — keep the split identical to Spark's.
    ws = re.compile(r"[ \t\n\r\f\x0B]+")
    merge_list = list(merges)

    def _segment_len(word: str, cache: dict[str, int]) -> int:
        hit = cache.get(word)
        if hit is not None:
            return hit
        syms = list(word.replace(SEP, "")) + [END_WORD]
        present = set(syms)
        for a, b in merge_list:
            if a not in present or b not in present:
                continue
            out: list[str] = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            if len(out) < n:
                syms = out
                present = set(syms)
        cache[word] = len(syms)
        return len(syms)

    def _run(batches):
        import pandas as pd

        cache: dict[str, int] = {}
        for pdf in batches:
            ids, ntok, nsub = [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in ws.split((text or "").lower().strip())
                         if w]
                ids.append(rid)
                ntok.append(len(words))
                nsub.append(sum(_segment_len(w, cache) for w in words))
            yield pd.DataFrame(
                {id_col: ids, "n_tokens": ntok, "n_subwords": nsub})

    return docs.select(id_col, text_col).mapInPandas(_run, out_schema)


def bpe_segment_oracle_sql(
    merges: list[tuple[str, str]],
    docs_table: str = "documents",
) -> str:
    """DuckDB twin of :func:`bpe_segment`: the same separator-framed
    replace chain as one nested expression per word, aggregated back
    per document (left join keeps zero-token documents at 0/0)."""
    s = ("chr(31) || array_to_string(regexp_extract_all("
         "replace(w, chr(31), ''), '.'), chr(31))"
         " || chr(31) || '</w>' || chr(31)")
    for a, b in merges:
        qa, qb = a.replace("'", "''"), b.replace("'", "''")
        s = (f"replace({s}, chr(31) || '{qa}' || chr(31) || '{qb}'"
             f" || chr(31), chr(31) || '{qa}{qb}' || chr(31))")
    return f"""
with per_word as (
  select doc_id, unnest(list_filter(regexp_split_to_array(
    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+'),
    x -> length(x) > 0)) as w
  from {docs_table}
),
seg as (
  select doc_id,
    len(list_filter(string_split({s}, chr(31)), x -> x <> '')) as ns
  from per_word
),
agg as (
  select doc_id, cast(count(*) as bigint) as n_tokens,
         cast(sum(ns) as bigint) as n_subwords
  from seg group by doc_id
)
select d.doc_id,
       coalesce(a.n_tokens, cast(0 as bigint)) as n_tokens,
       coalesce(a.n_subwords, cast(0 as bigint)) as n_subwords
from {docs_table} d left join agg a using (doc_id)
"""


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
