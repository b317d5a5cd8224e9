"""Text-analysis columns for a training-data pipeline — all pure
Catalyst expressions (regexp/array built-ins), no Python in the hot
path, so they scale to 100 TB of documents unchanged.

The seed for this family is the reference's regex text scan
(filter_.py:110-112); everything else is the standard LLM-pipeline
extension set (token counts, quality ratios, language ID,
fingerprinting).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_RE = "[a-z]+"
# BPE-ish tokenizer: letter runs, digit runs, or single non-space symbol.
# The whitespace complement is spelled out because the pattern is shared
# verbatim with the DuckDB twin and Java \s includes vertical tab
# (U+000B) while RE2 \s does not (review r7 — same class as the \S+
# tokenizer sweep).
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"
PUNCT_RE = "[.,;:!?]"

# Marker stopwords per language for the n-gram/stopword heuristic
# language ID.  Deterministic argmax with fixed priority order.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|a|of|and|to)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|y|es)\b",
}


def words(text: Column) -> Column:
    """Lower-cased word tokens: runs of [a-z].

    Implemented as split-on-complement + drop-empties, which produces
    the IDENTICAL token list to ``regexp_extract_all(lower(text),
    '[a-z]+')`` (the form every DuckDB oracle uses) but measures ~35%
    faster warm (0.19 s vs 0.29 s for the sf0.1 tokenize+explode) —
    split makes one pass without per-match group extraction."""
    return F.filter(
        F.split(F.lower(text), "[^a-z]+"), lambda x: x != F.lit("")
    )


def token_count(text: Column) -> Column:
    """Whitespace-word count: ``regexp_count(text, '\\S+')`` — counts
    maximal non-whitespace runs without materializing a token array
    (Java ``\\S`` is exactly ``[^ \\t\\n\\x0B\\f\\r]`` so counts match
    the split-and-drop-empties form and the oracle's explicit class)."""
    return F.regexp_count(text, F.lit(r"\S+"))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count (letter runs / digit runs / symbols)."""
    return F.regexp_count(text, F.lit(BPE_RE))


def quality_columns(text: Column) -> dict[str, Column]:
    """Quality-scoring signals: length, word stats, punctuation and
    stopword ratios.  All ratios NULL-safe on empty documents.

    Scans of ``text`` are fused to the minimum: punctuation and
    non-space chars count via ``translate`` + length deltas (a plain
    char-map pass, no regex engine); word and stopword counts via
    ``regexp_count`` (pure counter — no per-row match-array
    allocation, unlike ``regexp_extract_all``-then-size).  The
    stopword pattern keeps its ``\\b`` boundaries (digit adjacency!)
    which are not reproducible from a split-token array."""
    n_chars = F.length(text)
    # regexp_count == size(regexp_extract_all(...)) without building
    # the per-row match array (pure counter, no ArrayData allocation).
    n_words = F.regexp_count(F.lower(text), F.lit("[a-z]+"))
    n_punct = n_chars - F.length(F.translate(text, ".,;:!?", ""))
    n_stop = F.regexp_count(F.lower(text), F.lit(LANG_MARKERS["en"]))
    nz = F.when(n_words > 0, n_words.cast("double"))
    # Java \s == [ \t\n\x0B\f\r]
    avg_word_len = F.length(F.translate(text, " \t\n\x0b\f\r", "")) / nz
    return {
        "n_chars": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "punct_ratio": F.round(n_punct / nz, 4),
        "stopword_ratio": F.round(n_stop / nz, 4),
        "avg_word_len": F.round(avg_word_len, 4),
    }


def quality_score_from(q: dict[str, Column]) -> Column:
    """Composite [0,1]-ish quality score from already-computed
    ``quality_columns`` — callers that also project the signal columns
    reuse them instead of re-deriving every ratio from raw text."""
    score = (
        F.least(q["n_words"] / F.lit(50.0), F.lit(1.0)) * 0.4
        + F.coalesce(q["stopword_ratio"], F.lit(0.0)) * 0.4
        + F.least(F.coalesce(q["punct_ratio"], F.lit(0.0)) * 5, F.lit(1.0)) * 0.2
    )
    return F.round(score, 4)


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish quality score; weights are heuristic and
    documented, determinism is what matters."""
    return quality_score_from(quality_columns(text))


def lang_scores(text: Column) -> dict[str, Column]:
    return {
        lang: F.regexp_count(F.lower(text), F.lit(pat))
        for lang, pat in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Stopword-marker argmax language ID with a CJK fast path.

    Deterministic tie-break: priority order en > de > fr > es; 'und'
    (undetermined) when nothing scores.
    """
    scores = lang_scores(text)
    # rlike short-circuits at the first CJK char (no match-array, no
    # full-document count just to test > 0)
    has_cjk = text.rlike(r"[一-鿿]")
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return F.when(has_cjk, F.lit("zh")).otherwise(out)


# PII patterns (scrub order matters: emails first so their digit runs
# are gone before the phone/number passes; IPv4 before bare digit runs).
# Kept to constructs valid in BOTH Java and DuckDB (RE2-ish) dialects so
# the oracle twin can reuse the exact same strings.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"(?:\(\d{3}\)|\b\d{3})[ .-]\d{3}[ .-]\d{4}\b", "<PHONE>"),
    ("id_number", r"\b\d{6,}\b", "<ID>"),
)


def pii_scrub(text: Column) -> dict[str, Column]:
    """PII redaction as pure Catalyst regexp passes — no Python in the
    hot path, so this scales to 100 TB of documents unchanged.

    Returns the scrubbed text plus a per-category redaction count.
    Counts are taken on the *pre-pass* text for that category (after
    earlier categories were replaced), matching the sequential
    replacement semantics exactly; the oracle twin applies the same
    passes in the same order.
    """
    out: dict[str, Column] = {}
    cur = text
    for name, pat, token in PII_PATTERNS:
        out[f"n_{name}"] = F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).cast("long")
        cur = F.regexp_replace(cur, pat, token)
    out["scrubbed"] = cur
    return out


def normalize(text: Column) -> Column:
    r"""Dedup normalization: lowercase, collapse whitespace, trim.

    The whitespace class is spelled out instead of ``\s`` because the
    two engines disagree on it: Java's ``\s`` includes vertical tab
    (\x0B), RE2's (DuckDB) does not — an implicit class would produce
    divergent fingerprints on text containing \x0B."""
    return F.trim(F.regexp_replace(F.lower(text), r"[ \t\n\f\r]+", " "))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (first 16 hex
    chars — 64 bits, plenty below ~10^9 docs per birthday bound;
    use the full 128 bits at 100 TB scale)."""
    return F.substring(F.md5(normalize(text)), 1, 16)


# ---------------------------------------------------------------------
# Spark-SQL expression-string twins of the Column helpers above.
#
# Building a wide Column projection costs one py4j round-trip per
# F.* call — profiled at ~0.2-0.4 s per fn() invocation for the
# llm_prep_pipeline chain (PLANS.md r8), pure driver-side overhead
# repaid on every fresh plan.  A selectExpr string is ONE call parsed
# JVM-side into the identical expression tree (values pytest-pinned
# against the Column forms).  Generated from the same pattern
# constants so the two forms cannot drift on the word lists.
# ---------------------------------------------------------------------


def _sql_quote(pat: str) -> str:
    """Regex pattern -> Spark-SQL string literal (backslashes doubled:
    the SQL parser processes '\\b' as backspace unless escaped)."""
    return "'" + pat.replace("\\", "\\\\") + "'"


def lang_id_sql(col: str = "text") -> str:
    """Spark-SQL twin of ``lang_id`` (same CJK fast path, same
    en > de > fr > es tie priority)."""
    counts = {
        lang: f"regexp_count(lower({col}), {_sql_quote(pat)})"
        for lang, pat in LANG_MARKERS.items()
    }
    best = f"greatest({', '.join(counts.values())})"
    arms = "\n         ".join(
        f"WHEN {c} > 0 AND {c} = {best} THEN '{lang}'"
        for lang, c in counts.items()
    )
    return (
        f"CASE WHEN {col} RLIKE '[一-鿿]' THEN 'zh'\n"
        f"         {arms}\n"
        f"         ELSE 'und' END"
    )


def quality_score_sql(col: str = "text") -> str:
    """Spark-SQL twin of ``quality_score`` (identical round/coalesce
    structure; duplicate count subtrees are codegen-CSE'd)."""
    n_words = f"regexp_count(lower({col}), '[a-z]+')"
    n_punct = f"(length({col}) - length(translate({col}, '.,;:!?', '')))"
    n_stop = f"regexp_count(lower({col}), {_sql_quote(LANG_MARKERS['en'])})"
    nz = f"(CASE WHEN {n_words} > 0 THEN CAST({n_words} AS DOUBLE) END)"
    return (
        f"round(least({n_words} / 50.0, 1.0) * 0.4"
        f" + coalesce(round({n_stop} / {nz}, 4), 0.0) * 0.4"
        f" + least(coalesce(round({n_punct} / {nz}, 4), 0.0) * 5, 1.0) * 0.2, 4)"
    )


def token_count_sql(col: str = "text") -> str:
    """Spark-SQL twin of ``token_count``."""
    return f"regexp_count({col}, '\\\\S+')"


def fingerprint_sql(col: str = "text") -> str:
    """Spark-SQL twin of ``fingerprint`` (same explicit whitespace
    class — see ``normalize`` on the \\x0B trap)."""
    return (
        f"substring(md5(trim(regexp_replace(lower({col}),"
        f" '[ \\\\t\\\\n\\\\f\\\\r]+', ' '))), 1, 16)"
    )
