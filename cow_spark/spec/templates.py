"""Two-tier template compiler: COW's Jinja-then-format semantics.

The reference expands every template in two stages against the row dict
(all values are strings, plus int ``_row``): first a Jinja2 render, then a
Python ``str.format`` (src/converter/csvw.py:831-869; semantics
docs/index.rst:543-595). Jinja+iribaker cost COW 25-50% of its runtime
(docs/speed_performance.md:9-10) — this module is the "codegen" answer:

- **static path**: patterns built only from literal text, ``{name}``
  format fields (optionally ``{name:05d}``) and simple ``{{name}}`` Jinja
  echoes compile to pure Column expressions (``concat``/``format_string``)
  → JVM whole-stage codegen, zero Python.
- **jinja path**: anything with ``{%``, filters, expressions, or odd
  braces falls back to an Arrow-batched pandas UDF that compiles the Jinja
  template once per executor (module-level cache ≅ COW's per-converter
  ``self.templates`` cache, csvw.py:841-844) and renders per batch.
  A failed render/format yields NULL → the triple is skipped, matching
  COW's per-column exception containment (csvw.py:544-552,859-866).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Mapping

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DataType,
    DateType,
    StringType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Canonical stringification: COW's row dict holds CSV *strings*. For typed
# inputs (transcripts: int turn_idx, timestamp ts) we define one canonical
# string rendering used consistently by templates, null checks, the Python
# oracle, and the DuckDB oracle SQL. SQL NULL ≡ '' (CSV has no NULLs; empty
# cell semantics apply).
# ---------------------------------------------------------------------------

TS_FMT = "yyyy-MM-dd HH:mm:ss"
TS_FMT_PY = "%Y-%m-%d %H:%M:%S"


def stringify(c: Column, dt: DataType) -> Column:
    if isinstance(dt, StringType):
        out = c
    elif isinstance(dt, TimestampType):
        out = F.date_format(c, TS_FMT)
    elif isinstance(dt, DateType):
        out = F.date_format(c, "yyyy-MM-dd")
    else:
        out = c.cast("string")
    return F.coalesce(out, F.lit(""))


def stringify_py(v: object) -> str:
    import datetime

    if v is None:
        return ""
    if isinstance(v, str):
        return v
    if isinstance(v, datetime.datetime):
        return v.strftime(TS_FMT_PY)
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


# ---------------------------------------------------------------------------
# Tokenizer / classifier
# ---------------------------------------------------------------------------

# {{ name }} (Jinja echo) | {name} / {name:05d} (format field) |
# {{ name|filter }} (simple filter) | {{ '%0Nd'|format(name|int) }}
_TOKEN = re.compile(
    r"\{\{\s*([A-Za-z_]\w*)\s*\}\}"  # g1: jinja echo
    r"|\{([A-Za-z_]\w*)(?::(0?\d*d))?\}"  # g2: format field, g3: int fmt
    r"|\{\{\s*([A-Za-z_]\w*)\s*\|\s*(lower|upper|trim|length)(?:\(\))?\s*\}\}"
    # g4: var, g5: filter
    r"|\{\{\s*'%(0\d+d|d)'\s*\|\s*format\(\s*([A-Za-z_]\w*)\s*\|\s*int\s*\)\s*\}\}"
    # g6: printf spec, g7: var
)

# simple single if/else on a string-literal comparison — COW's documented
# conditional idiom (docs/index.rst:597-611,637); everything else goes to
# the exact Jinja renderer
_IF_RE = re.compile(
    r"^(?P<pre>.*?)\{%\s*if\s+(?P<var>[A-Za-z_]\w*)\s*(?P<op>==|!=)\s*"
    r"(?P<q>['\"])(?P<val>.*?)(?P=q)\s*%\}(?P<then>.*?)"
    r"(?:\{%\s*else\s*%\}(?P<els>.*?))?\{%\s*endif\s*%\}(?P<post>.*)$",
    re.S,
)


@dataclass(frozen=True)
class CompiledTemplate:
    """A template compiled to either Column parts or a Jinja fallback."""

    pattern: str
    kind: str  # 'const' | 'static' | 'jinja'
    # static path: list of ('lit', text) | ('ref', name, fmt-or-None)
    parts: tuple = field(default_factory=tuple)

    @property
    def refs(self) -> tuple[str, ...]:
        if self.kind in ("jinja", "ifelse"):
            # jinja: unknown statically — caller passes the full row
            return ()
        return tuple(p[1] for p in self.parts if p[0] != "lit")

    # -- Spark side ---------------------------------------------------------
    def column(self, row: Mapping[str, Column]) -> Column:
        """Compile to a Column. ``row`` maps field name → *stringified* col
        (plus '_row' when available). Jinja-path templates render via the
        Arrow UDF over all provided fields."""
        if self.kind == "const":
            # const patterns contain no braces at all (classifier invariant)
            return F.lit(self.pattern)
        if self.kind == "ifelse":
            var, op, val, pre, then, els, post = self.parts
            if var not in row:
                # Jinja: Undefined == 'x' is False, Undefined != 'x' is
                # True — the branch is decided, not skipped
                picked = els if op == "==" else then
                return F.concat(pre.column(row), picked.column(row),
                                post.column(row))
            cond = (row[var] == F.lit(val)) if op == "==" else (
                row[var] != F.lit(val))
            picked = F.when(cond, then.column(row)).otherwise(els.column(row))
            return F.concat(pre.column(row), picked, post.column(row))
        if self.kind == "static":
            cols: list[Column] = []
            for p in self.parts:
                if p[0] == "lit":
                    cols.append(F.lit(p[1]))
                    continue
                name = p[1]
                if name not in row:
                    # Jinja-stage tokens render Undefined per jinja2
                    # semantics (verified against jinja2 3.x): {{x}} and
                    # soft-str filters → '', |length → '0', |int inside
                    # |format → UndefinedError → render fails → skip.
                    # Only the str.format stage ({x}) raises KeyError →
                    # triple skipped (csvw.py:859-866).
                    if p[0] == "jref" or (p[0] == "fn" and p[2] != "length"):
                        cols.append(F.lit(""))
                        continue
                    if p[0] == "fn" and p[2] == "length":
                        cols.append(F.lit("0"))
                        continue
                    return F.lit(None).cast("string")
                c = row[name]
                if p[0] == "fn":
                    fn = p[2]
                    c = {
                        "lower": F.lower,
                        "upper": F.upper,
                        "trim": F.trim,
                        "length": lambda x: F.length(x).cast("string"),
                    }[fn](c)
                elif p[0] == "fmtint":
                    # '%0Nd'|format(x|int): jinja's |int coerces via
                    # int() then float() and falls back to 0 ('x' → 0,
                    # '3.7' → 3, '' → 0 — verified); try_cast keeps the
                    # ANSI-mode engine from aborting the job on bad cells
                    as_long = F.coalesce(
                        c.try_cast("long"),
                        c.try_cast("double").cast("long"),
                        F.lit(0),
                    )
                    c = F.format_string("%" + p[2], as_long)
                cols.append(c)
            if not cols:
                return F.lit("")
            return F.concat(*cols)
        return jinja_column(self.pattern, row)

    # -- Python side (oracle / driver validation) ---------------------------
    def render_py(self, row: Mapping[str, object]) -> str | None:
        return render_template_py(self.pattern, row)


def compile_template(pattern: str) -> CompiledTemplate:
    """Classify + compile one pattern string (already URL-resolved)."""
    if "{#" in pattern:
        return CompiledTemplate(pattern, "jinja")
    if "{%" in pattern:
        lowered = _try_if_lowering(pattern)
        return lowered or CompiledTemplate(pattern, "jinja")
    parts: list[tuple] = []
    pos = 0
    for m in _TOKEN.finditer(pattern):
        lit = pattern[pos : m.start()]
        if lit:
            parts.append(("lit", lit))
        if m.group(1):
            # jinja echo — Undefined renders '' (unlike {x} format fields)
            parts.append(("jref", m.group(1), None))
        elif m.group(4):
            parts.append(("fn", m.group(4), m.group(5)))
        elif m.group(6):
            parts.append(("fmtint", m.group(7), m.group(6)))
        elif m.group(3):
            # format specs ({x:05d}) only work on int fields in COW (row
            # values are CSV strings; a 'd' spec on a str raises → triple
            # skipped, csvw.py:859-866) — keep the exact renderer's behavior
            return CompiledTemplate(pattern, "jinja")
        else:
            parts.append(("ref", m.group(2), m.group(3)))
        pos = m.end()
    tail = pattern[pos:]
    if tail:
        parts.append(("lit", tail))
    # any brace left in literal segments → non-simple Jinja/format syntax
    # (incl. '{{' escapes / expressions) → fall back to the exact two-stage
    # renderer rather than risk diverging from COW
    joined_lits = "".join(p[1] for p in parts if p[0] == "lit")
    if "{" in joined_lits or "}" in joined_lits:
        return CompiledTemplate(pattern, "jinja")
    if all(p[0] == "lit" for p in parts):
        return CompiledTemplate(pattern, "const", tuple(parts))
    return CompiledTemplate(pattern, "static", tuple(parts))


def _try_if_lowering(pattern: str) -> CompiledTemplate | None:
    """Lower ``pre {% if var == 'lit' %}A{% else %}B{% endif %} post`` to a
    conditional Column when all fragments are themselves static. Returns
    None (→ exact Jinja renderer) for anything more complex."""
    m = _IF_RE.match(pattern)
    if m is None:
        return None
    frags = {}
    for key in ("pre", "then", "els", "post"):
        sub = compile_template(m.group(key) or "")
        if sub.kind not in ("const", "static"):
            return None
        frags[key] = sub
    return CompiledTemplate(
        pattern,
        "ifelse",
        (m.group("var"), m.group("op"), m.group("val"),
         frags["pre"], frags["then"], frags["els"], frags["post"]),
    )


# ---------------------------------------------------------------------------
# Jinja fallback (Arrow-batched pandas UDF)
# ---------------------------------------------------------------------------

_TPL_CACHE: dict[str, object] = {}  # per-executor-process compile cache


def _compiled(pattern: str):
    tpl = _TPL_CACHE.get(pattern)
    if tpl is None:
        from jinja2 import Template

        tpl = _TPL_CACHE[pattern] = Template(pattern)
    return tpl


def render_template_py(pattern: str, row: Mapping[str, object]) -> str | None:
    """Jinja render then str.format, None on failure (COW skips the triple:
    render_pattern csvw.py:857-866 + the per-column catch at :551)."""
    try:
        rendered = _compiled(pattern).render(**row)
    except Exception:
        return None
    try:
        return rendered.format(**row)
    except Exception:
        return None


def jinja_column(pattern: str, row: Mapping[str, Column]) -> Column:
    """Arrow-batched renderer over a struct of the stringified row fields."""
    names = list(row.keys())

    @F.pandas_udf("string")
    def _render(batch: pd.DataFrame) -> pd.Series:
        tpl_pattern = pattern
        out = []
        cols = batch.columns.tolist()
        for tup in batch.itertuples(index=False, name=None):
            d = dict(zip(cols, tup))
            if "_row" in d and d["_row"] is not None:
                try:
                    d["_row"] = int(d["_row"])
                except (TypeError, ValueError):
                    pass
            out.append(render_template_py(tpl_pattern, d))
        return pd.Series(out, dtype="object")

    return _render(F.struct(*[row[n].alias(n) for n in names]))
