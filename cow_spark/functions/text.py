"""Text-analysis functions for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All pure Column expressions (whole-stage codegen; zero Python) and all
expressible in ANSI-ish SQL so the DuckDB oracle can replay them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword probes (top function words). Deliberately
# small: language ID here is an n-gram/stopword heuristic, not a model.
LANG_PROBES: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is)\b",
    "de": r"\b(der|die|das|und|ist|nicht)\b",
    "fr": r"\b(le|la|les|et|est|dans)\b",
    "nl": r"\b(de|het|een|en|van|niet)\b",
    "es": r"\b(el|la|los|y|es|en)\b",
}

_WS = r"\s+"
_PUNCT = r"[!-/:-@\[-`{-~]"  # ASCII punctuation ranges


def tokens(c: Column) -> Column:
    """Whitespace tokens, empty-safe (''→ empty array)."""
    t = F.split(F.trim(c), _WS)
    return F.filter(t, lambda x: F.length(x) > 0)


def token_count(c: Column) -> Column:
    return F.size(tokens(c))


def bpe_ish_token_count(c: Column) -> Column:
    """Sub-word-ish count: runs of letters, digits, or single punctuation
    (a cheap stand-in for BPE tokenization at data-audit time)."""
    return F.size(
        F.regexp_extract_all(c, F.lit(r"[A-Za-zÀ-ÿ]+|[0-9]+|[^A-Za-zÀ-ÿ0-9\s]"), 0)
    )


def punct_ratio(c: Column) -> Column:
    n = F.length(c)
    return F.when(n > 0,
                  F.round(F.size(F.regexp_extract_all(c, F.lit(_PUNCT), 0))
                          / n.cast("double"), 6)).otherwise(F.lit(0.0))


def stopword_ratio(c: Column, lang: str = "en") -> Column:
    nt = token_count(c)
    hits = F.size(F.regexp_extract_all(F.lower(c), F.lit(LANG_PROBES[lang]), 0))
    return F.when(nt > 0, F.round(hits / nt.cast("double"), 6)).otherwise(F.lit(0.0))


def quality_score(c: Column) -> Column:
    """[0,1] heuristic: rewards mid-length text with stopwords, penalizes
    punctuation soup — the classic pre-training quality gate shape."""
    n = F.length(c)
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(c) * 4.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(1.0) - punct_ratio(c) * 4.0, F.lit(0.0))
    return F.round((len_score + stop_score + punct_pen) / 3.0, 6)


def lang_id(c: Column) -> Column:
    """argmax over stopword-probe hit counts; 'und' when all zero.
    Deterministic tie-break: first language in LANG_PROBES order wins."""
    lowered = F.lower(c)
    scores = {
        lang: F.size(F.regexp_extract_all(lowered, F.lit(pat), 0))
        for lang, pat in LANG_PROBES.items()
    }
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(list(LANG_PROBES)):  # build when-chain in order
        out = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def normalize_text(c: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(c), _WS, " "))


def fingerprint(c: Column) -> Column:
    """Deterministic document fingerprint (md5 of normalized text —
    portable to the oracle; use xxhash64 internally when replay isn't
    needed)."""
    return F.md5(normalize_text(c))


# URL/domain analysis — crawl-corpus auditing (per-domain counts drive
# source weighting and blocklists). The pattern lives in the Java∩RE2
# regex subset so the DuckDB oracle replays it exactly.
# NB: an explicit whitespace class, not [^\s] — Java's \s includes
# \x0B (vertical tab) while RE2's does not, so \s-based patterns can
# diverge between Spark and the DuckDB oracle on adversarial text
URL_PATTERN = r"https?://[A-Za-z0-9.-]+(:[0-9]+)?(/[^ \t\n\r\f\x0B]*)?"
_DOMAIN_FROM_URL = r"https?://([A-Za-z0-9.-]+)"


def extract_urls(c: Column) -> Column:
    """All http(s) URLs in the text, in order of appearance."""
    return F.regexp_extract_all(c, F.lit(URL_PATTERN), 0)


def url_domains(c: Column) -> Column:
    """Lower-cased registrable-host part of every URL in the text
    (port and path stripped; no PSL suffix logic — that's a lookup
    table join, not a parser concern)."""
    return F.transform(
        extract_urls(c),
        lambda u: F.lower(F.regexp_extract(u, _DOMAIN_FROM_URL, 1)),
    )


# ---------------------------------------------------------------------------
# markup stripping (WET-style crawl text extraction)
# ---------------------------------------------------------------------------

# Java ∩ RE2 subset only (the DuckDB oracle replays these): no
# backreferences (script/style get separate patterns), no \s (explicit
# classes), (?i)/(?s) flags are fine in both engines.
_SCRIPT_BLOCK = r"(?is)<script\b[^>]*>.*?</script>"
_STYLE_BLOCK = r"(?is)<style\b[^>]*>.*?</style>"
_HTML_COMMENT = r"(?s)<!--.*?-->"
_BLOCK_TAG = r"(?i)</?(p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|blockquote)\b[^>]*>"
_ANY_TAG = r"<[^>]*>"
_TAG_COUNT = _ANY_TAG
# entity decode order matters: &amp; must go LAST or '&amp;lt;' would
# double-decode
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]
_HSPACE = r"[ \t\x0B\f\r]+"


def strip_markup(c: Column) -> Column:
    """Markup-to-text for crawl-style corpora: drop script/style/comment
    blocks wholesale, turn block-level tags into newlines (so paragraph
    boundaries survive), strip remaining tags, decode the six common
    entities, and collapse whitespace. A regexp_replace chain — one
    codegen stage, no Python — covering the WET-extraction core; it is
    deliberately not a layout engine (no link-density boilerplate
    scoring; compose :func:`~cow_spark.operators.quality` gates for
    that)."""
    t = F.regexp_replace(c, _SCRIPT_BLOCK, " ")
    t = F.regexp_replace(t, _STYLE_BLOCK, " ")
    t = F.regexp_replace(t, _HTML_COMMENT, " ")
    t = F.regexp_replace(t, _BLOCK_TAG, "\n")
    t = F.regexp_replace(t, _ANY_TAG, " ")
    # a truncated trailing tag (crawl cut-off mid-markup) never closes:
    # drop it to end-of-input rather than leaking raw markup
    t = F.regexp_replace(t, r"<[^>]*$", " ")
    for ent, ch in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.regexp_replace(t, _HSPACE, " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n+", "\n")
    return F.btrim(t, F.lit(" \n"))


def markup_stats(c: Column) -> Column:
    """(n_tags, text_ratio_bp) audit struct for a markup column:
    tag count and extracted-text length in basis points of the raw
    length — the crawl-extraction yield signal."""
    stripped = strip_markup(c)
    return F.struct(
        F.regexp_count(c, F.lit(_TAG_COUNT)).alias("n_tags"),
        F.floor(F.length(stripped) * 10000 /
                F.greatest(F.length(c), F.lit(1))).cast("long")
        .alias("text_ratio_bp"))


# ---------------------------------------------------------------------------
# URL canonicalization (crawl-dedup key; CCNet dedups by URL before text)
# ---------------------------------------------------------------------------

# Java ∩ RE2 subset; the DuckDB twin replays these with \1-style
# backreferences where Spark uses $1 (oracle SQL owns that spelling)
_TRACKING_PARAM = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref|ref_src)="
# scheme match is case-insensitive ((?i: — Java and RE2 both support
# it): HTTP://Ex.com must canonicalize like http://, not pass through
_URL_HEAD = r"^((?i:https?)://[A-Za-z0-9.-]+(:[0-9]+)?)"


def canonical_url(c: Column) -> Column:
    """Canonical form of an http(s) URL — the dedup key, NOT a pretty
    printer. Rules, in order:

    1. fragment stripped (``#...`` never reaches the server);
    2. scheme+host lowercased (path/query case is significant);
    3. default ports dropped (``:80`` http, ``:443`` https);
    4. tracking query params removed (``utm_*``, ``fbclid``,
       ``gclid``, ``msclkid``, ``ref``, ``ref_src``), remaining
       params kept IN ORDER (reordering would conflate genuinely
       order-sensitive endpoints);
    5. an emptied query drops its ``?``.

    Pure Column expressions; the per-param filter is a higher-order
    lambda over the split query — bounded by the param count, and the
    split array is the expression's own column (no captured-subtree
    re-evaluation). Non-URL input passes through steps that no-op.
    """
    u = F.regexp_replace(c, r"#.*$", "")
    head = F.lower(F.regexp_extract(u, _URL_HEAD, 1))
    head = F.regexp_replace(head, r"^(http://[a-z0-9.-]+):80$", "$1")
    head = F.regexp_replace(head, r"^(https://[a-z0-9.-]+):443$", "$1")
    # rest-of-URL after the matched head (path portion, pre-query)
    raw_head_len = F.length(F.regexp_extract(u, _URL_HEAD, 1))
    path_and_q = F.substring(u, raw_head_len + 1, 1_000_000)
    path = F.substring_index(path_and_q, "?", 1)
    query = F.when(path_and_q.contains("?"),
                   F.regexp_extract(path_and_q, r"\?(.*)$", 1)) \
        .otherwise(F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM))
    q2 = F.array_join(kept, "&")
    return F.when(F.regexp_extract(u, _URL_HEAD, 1) == "", c).otherwise(
        F.concat(head, path,
                 F.when(q2 != "", F.concat(F.lit("?"), q2))
                 .otherwise(F.lit(""))))


SENT_BOUNDARY = "([.!?])[ \t\n\r\f\x0B]+"


def sentences(c: Column) -> Column:
    """Split text into sentences at terminal punctuation followed by
    whitespace — the rule-based segmenter under chunkers, readability
    metrics, and per-sentence dedup. RE2 (the DuckDB twin's engine)
    has no lookbehind, so the boundary is marked by a backreference
    rewrite (``$1`` + US control char) and split on the marker — both
    engines support capture-group replacement even though neither
    supports lookbehind. The whitespace class is explicit (``\\x0B``
    included — Java's ``\\s`` and RE2's differ there, the CLAUDE.md
    trap). Text without a terminal boundary is one sentence; empty
    text yields an empty array. Texts containing \\x1f are out of
    contract (control chars are encoding damage — screen upstream).
    """
    marked = F.regexp_replace(c, SENT_BOUNDARY, "$1\x1f")
    return F.filter(F.split(marked, "\x1f"),
                    lambda s: F.length(s) > 0)


_SOUNDEX_FROM = "BFPVCGJKQSXZDTLMNR"
_SOUNDEX_TO = "111122222222334556"


def soundex(c: Column) -> Column:
    """American Soundex — the classic phonetic blocking key for entity
    resolution: Robert/Rupert → R163, Ashcraft → A261 (H transparent
    between same codes), Pfister → P236 (first-letter code counts for
    collapsing). Neither engine ships a usable builtin here: Spark's
    ``F.soundex`` (Hive semantics) agrees on clean names but passes
    NON-ALPHA-LEADING input through UNCHANGED ("  o'Brien!" → itself,
    "123" → "123" — verified) where a blocking key must strip and
    NULL, and RE2-based DuckDB replay of run-collapsing needs pattern
    backreferences it lacks. So BOTH sides run the same explicit
    left fold over the letter sequence — the full spec, not a regex
    approximation:

    - letters map B F P V→1, C G J K Q S X Z→2, D T→3, L→4, M N→5,
      R→6; A E I O U Y are separators (reset the run); H W are
      transparent (preserve it); non-letters are stripped first
    - a digit equal to the previous EFFECTIVE code is skipped (runs
      collapse across H/W, break across vowels), the first letter's
      own code seeds the run
    - output = first letter + digits, zero-padded/truncated to 4;
      no letters at all → NULL

    One HOF ``aggregate`` over the char array (struct accumulator);
    the DuckDB twin folds the identical sequence with a
    string-encoded accumulator (its ``list_reduce`` requires acc type
    = element type — the subword.py delimited-string trick).
    """
    letters = F.filter(F.split(F.upper(c), ""),
                       lambda ch: ch.rlike("^[A-Z]$"))

    def step(acc, ch):
        code = F.translate(ch, _SOUNDEX_FROM, _SOUNDEX_TO)
        is_digit = code.rlike("^[1-6]$")
        is_hw = ch.isin("H", "W")
        first = acc["out"] == ""
        out = (F.when(first, ch)
               .when(is_digit & (code != acc["last"]),
                     F.concat(acc["out"], code))
               .otherwise(acc["out"]))
        last = (F.when(first & is_digit, code)
                .when(first, F.lit("0"))
                .when(is_digit, code)
                .when(is_hw, acc["last"])
                .otherwise(F.lit("0")))
        return F.struct(out.alias("out"), last.alias("last"))

    folded = F.aggregate(
        letters,
        F.struct(F.lit("").alias("out"), F.lit("0").alias("last")),
        step)
    return F.when(F.size(letters) > 0,
                  F.rpad(F.substring(folded["out"], 1, 4), 4, "0"))


def soundex_sql(expr: str) -> str:
    """DuckDB twin of :func:`soundex` for oracle SQL strings — the
    same fold with a ``'OUT|last'`` string-encoded accumulator
    (``list_reduce`` requires acc type = element type; parse with
    left/right, never slices)."""
    code = f"translate(x, '{_SOUNDEX_FROM}', '{_SOUNDEX_TO}')"
    out = "left(acc, length(acc) - 2)"
    last = "right(acc, 1)"
    step = f"""(
      case
        when {last} = '#' then
          x || '|' || (case when {code} similar to '[1-6]'
                            then {code} else '0' end)
        when {code} similar to '[1-6]' and {code} <> {last} then
          {out} || {code} || '|' || {code}
        when {code} similar to '[1-6]' then acc
        when x in ('H', 'W') then acc
        else {out} || '|0'
      end)"""
    letters = (f"list_filter(string_split(upper({expr}), ''), "
               f"x -> x similar to '[A-Z]')")
    res = (f"list_reduce(list_prepend('|#', {letters}), "
           f"(acc, x) -> {step})")
    return f"""(
  case when len({letters}) > 0 then
    rpad(left(left({res}, length({res}) - 2), 4), 4, '0')
  end)"""
