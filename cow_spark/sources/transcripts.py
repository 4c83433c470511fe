"""Deterministic synthetic transcripts + entity dictionary (FIXTURES.md F1/F4).

Input table per BASELINE.json input_hint:
    transcripts(conv_id string, turn_idx int, role string, text string,
                tool string, ts timestamp)

Two generators that produce **byte-identical** data:
- :func:`transcripts_df`   — ``spark.range``-based, pure Column arithmetic
  (no Python on the executors, no shuffle; scales to billions of rows)
- :func:`transcripts_rows` — plain-Python twin for the oracle/unit tests

Determinism comes from a linear-congruential mix expressible identically
in Spark SQL integer arithmetic and Python (no RNG state, no wall clock).
~10% of conversations are "hot" (long), ~30% of mentions hit one hot
entity — exercising the skew-salting paths (BASELINE.json north_star).
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH = 1767225600  # 2026-01-01T00:00:00Z
SLOT = 16  # max turns per conversation slot
_M = 2147483647
_A = 1103515245

PERSONS = [f"Person{i:02d}" for i in range(50)]
CITIES = [
    "Amsterdam", "Berlin", "Cairo", "Denver", "Espoo", "Fukuoka", "Geneva",
    "Hanoi", "Istanbul", "Jakarta", "Kyoto", "Lima", "Madrid", "Nairobi",
    "Oslo", "Paris", "Quito", "Riga", "Seoul", "Tunis", "Utrecht", "Vienna",
    "Warsaw", "Xiamen", "Yerevan", "Zagreb", "Bogota", "Chennai", "Dakar",
    "Leiden",
]
ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "calc", "browse"]

# (printf-style format, arg kinds) — includes a quote+newline template and
# a non-ASCII template to exercise N-Quads escaping + IRI encoding
TEMPLATES: list[tuple[str, tuple[str, ...]]] = [
    ("Ask %s about %s on %s", ("P", "C", "D")),
    ("Meeting with %s in %s", ("P", "C")),
    ('Tell %s: "see you in %s"\non %s', ("P", "C", "D")),
    ("Résumé for %s — %s office", ("P", "C")),
    ("%s travels to %s", ("P", "C")),
    ("Schedule call %s / %s", ("P", "D")),
    ("note: %s", ("C",)),
    ("Weather in %s on %s", ("C", "D")),
]


def _mix_col(i: Column, salt: int) -> Column:
    # reduce i mod M BEFORE multiplying: (i%M)*A tops out near 2^61, but
    # a raw i*A wraps 64-bit long past i≈8.4e9 and silently diverges from
    # the arbitrary-precision Python twin; modular arithmetic makes the
    # two forms identical ((i*A+c) % M == ((i%M)*A+c) % M for i ≥ 0)
    return F.pmod(
        F.pmod(i, F.lit(_M)) * F.lit(_A) + F.lit(salt * 12345 + 7),
        F.lit(_M),
    )


def _mix_py(i: int, salt: int) -> int:
    return (i * _A + salt * 12345 + 7) % _M


def transcripts_df(
    spark: SparkSession, n_rows: int, start: int = 0
) -> DataFrame:
    """~0.47*n_rows transcript turns, pure Column arithmetic end-to-end.

    ``start`` offsets the id range: slices [0,n) and [n,2n) compose to
    exactly the rows of [0,2n) — lets separate executor processes generate
    disjoint shards of one deterministic dataset.
    """
    df = spark.range(start, start + n_rows, 1)
    i = F.col("id")
    conv = (i / SLOT).cast("long")
    turn = F.pmod(i, F.lit(SLOT)).cast("int")
    hot = _mix_col(conv, 13) % 10 == 0
    conv_len = F.when(hot, F.lit(SLOT)).otherwise(
        (_mix_col(conv, 7) % 12 + 1).cast("int")
    )
    df = df.where(turn < conv_len)

    person_idx = F.when(_mix_col(i, 19) % 10 < 3, F.lit(0)).otherwise(
        _mix_col(i, 17) % len(PERSONS)
    )
    person = F.element_at(F.array(*[F.lit(p) for p in PERSONS]),
                          (person_idx + 1).cast("int"))
    city = F.element_at(F.array(*[F.lit(c) for c in CITIES]),
                        (_mix_col(i, 41) % len(CITIES) + 1).cast("int"))
    ts = F.timestamp_seconds(F.lit(EPOCH) + i * 13)
    date_s = F.date_format(ts, "yyyy-MM-dd")

    def args_for(kinds: tuple[str, ...]) -> list[Column]:
        return [{"P": person, "C": city, "D": date_s}[k] for k in kinds]

    tpl_idx = _mix_col(i, 29) % len(TEMPLATES)
    text = None
    for k, (fmt, kinds) in enumerate(TEMPLATES):
        rendered = F.format_string(fmt, *args_for(kinds))
        # template 0 is the unconditional base of the when-chain
        text = rendered if text is None else F.when(tpl_idx == k, rendered).otherwise(text)
    text = (
        F.when(_mix_col(i, 31) % 20 == 0, F.lit(""))
        .when(_mix_col(i, 37) % 50 == 0, F.lit("N/A"))
        .otherwise(text)
    )

    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]),
                        (_mix_col(i, 23) % 3 + 1).cast("int"))
    tool = F.when(
        role == "tool",
        F.element_at(F.array(*[F.lit(t) for t in TOOLS]),
                     (_mix_col(i, 43) % 3 + 1).cast("int")),
    )

    return df.select(
        F.format_string("conv-%06d", conv).alias("conv_id"),
        turn.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def transcripts_rows(n_rows: int) -> list[dict]:
    """Python twin of :func:`transcripts_df` — identical values."""
    out = []
    for i in range(n_rows):
        conv, turn = divmod(i, SLOT)
        hot = _mix_py(conv, 13) % 10 == 0
        conv_len = SLOT if hot else _mix_py(conv, 7) % 12 + 1
        if turn >= conv_len:
            continue
        person = (
            PERSONS[0]
            if _mix_py(i, 19) % 10 < 3
            else PERSONS[_mix_py(i, 17) % len(PERSONS)]
        )
        city = CITIES[_mix_py(i, 41) % len(CITIES)]
        ts = datetime.datetime.fromtimestamp(
            EPOCH + i * 13, tz=datetime.timezone.utc
        ).replace(tzinfo=None)
        date_s = ts.strftime("%Y-%m-%d")
        fmt, kinds = TEMPLATES[_mix_py(i, 29) % len(TEMPLATES)]
        args = tuple({"P": person, "C": city, "D": date_s}[k] for k in kinds)
        text = fmt % args
        if _mix_py(i, 31) % 20 == 0:
            text = ""
        elif _mix_py(i, 37) % 50 == 0:
            text = "N/A"
        role = ROLES[_mix_py(i, 23) % 3]
        tool = TOOLS[_mix_py(i, 43) % 3] if role == "tool" else None
        out.append(
            {
                "conv_id": f"conv-{conv:06d}",
                "turn_idx": turn,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": ts,
            }
        )
    return out


# ---------------------------------------------------------------------------
# Entity dictionary (FIXTURES.md F4) — small enough to broadcast; one hot
# entity (Person00) receives ~30% of mentions via the generator above.
# ---------------------------------------------------------------------------


def entities_rows(n: int = 1000) -> list[dict]:
    names = PERSONS + CITIES
    out = []
    for j in range(n):
        name = names[j % len(names)] if j < 2 * len(names) else f"Distractor{j:04d}"
        aliases = [name.lower(), name.upper()][: _mix_py(j, 53) % 3]
        out.append(
            {
                "entity_id": f"ent-{j:05d}",
                "canonical_name": name,
                "aliases": aliases,
                "block_key": _block_key(name),
            }
        )
    return out


def _block_key(name: str) -> str:
    n = name.strip().lower()
    return f"{n[:2]}|{len(n)}"


def entities_df(spark: SparkSession, n: int = 1000) -> DataFrame:
    return spark.createDataFrame(
        entities_rows(n),
        schema="entity_id string, canonical_name string, aliases array<string>, block_key string",
    )
