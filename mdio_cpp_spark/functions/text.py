"""Text-analysis column functions — tokenize, token count, shingles,
fingerprint, quality features, language-ID heuristic.

All built from ``pyspark.sql.functions`` (JVM-side, codegen'd) — no Python
UDFs. Every function here has an exact ANSI-SQL twin used by the DuckDB
oracles in ``plans/``: the formulas are written to be bit-identical across
engines (md5 hex strings, integer token counts, double arithmetic with a
fixed evaluation order).

The reference has no text surface (pure array store, SURVEY §2.5); this is
north-star extension work per BASELINE.json — the operators a large-scale
training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens(text: str | Column) -> Column:
    """Lowercase word tokens; empty strings (leading/trailing separators)
    removed. Oracle twin: list_filter(regexp_split_to_array(lower(t), re), x -> x <> '')."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda x: x != F.lit(""))


def token_count(text: str | Column) -> Column:
    return F.size(tokens(text)).cast("long")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """All n-word shingles (space-joined), in order; EMPTY for docs shorter
    than n. The guard matters: ``sequence(0, size-n)`` runs DESCENDING when
    size < n, and the resulting 0/negative slice index is a runtime error
    under ANSI — a single short document would kill the whole job where
    callers forgot to pre-filter (found by
    tests/test_operator_properties.test_tokens_match_re_model)."""
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - F.lit(n))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))


def count_token(toks: Column, word: str) -> Column:
    """Occurrences of an exact token (frequency-weighted)."""
    return F.size(F.filter(toks, lambda x: x == F.lit(word)))


def fingerprint(text: str | Column) -> Column:
    """Document fingerprint: md5 over the sorted distinct token set —
    order-insensitive content hash (the scalable analog of a rolling hash:
    identical docs up to word order collide)."""
    t = F.array_sort(F.array_distinct(tokens(text)))
    return F.md5(F.concat_ws(" ", t))


_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "y"),
}


def lang_scores(toks: Column) -> dict[str, Column]:
    """Marker-token hit counts per language (n-gram heuristic)."""
    out = {}
    for lang, markers in _LANG_MARKERS.items():
        s = None
        for m in markers:
            c = count_token(toks, m)
            s = c if s is None else (s + c)
        out[lang] = s
    return out


def _lang_argmax(s: dict[str, Column]) -> Column:
    """Deterministic argmax of marker scores, ties resolved in the fixed
    order en > de > fr > es (greater-or-equal chain)."""
    return (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]), F.lit("en"))
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), F.lit("de"))
        .when(s["fr"] >= s["es"], F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def lang_id(text: str | Column) -> Column:
    """Single-Column language ID. NOTE: the argmax duplicates each score
    expression and each score duplicates the tokenizer, and Spark does NOT
    common-subexpression-eliminate higher-order functions (filter/transform
    lambdas) — this form re-runs the regex split ~30× per row. Fine for
    unit tests; hot paths use ``with_lang_id`` (measured 2.4× faster at
    sf0.1)."""
    return _lang_argmax(lang_scores(tokens(text)))


def with_lang_id(df, text_col: str, out: str = "pred_lang"):
    """Staged language ID: materialize the token array and the four marker
    scores as real columns before the argmax, so the regex tokenizer runs
    ONCE per row. CollapseProject keeps the staged aliases un-inlined
    because each is referenced more than once. Same formula → same result
    as ``lang_id`` bit-for-bit; only the evaluation count changes."""
    staging = ["_li_toks"] + [f"_li_{lang}" for lang in _LANG_MARKERS]
    clash = [c for c in staging if c in df.columns]
    if clash:
        # silently replacing-then-dropping a caller's column would lose it
        raise ValueError(f"with_lang_id staging columns already exist: {clash}")
    d = df.withColumn("_li_toks", tokens(F.col(text_col)))
    scores = lang_scores(F.col("_li_toks"))
    d = d.withColumns({f"_li_{lang}": s for lang, s in scores.items()})
    pred = _lang_argmax({lang: F.col(f"_li_{lang}") for lang in _LANG_MARKERS})
    return d.withColumn(out, pred).drop(
        "_li_toks", *[f"_li_{lang}" for lang in _LANG_MARKERS]
    )


def quality_score(text: str | Column, toks: Column | None = None) -> Column:
    """Composite [0,1] quality score: length factor × (1 − punctuation
    ratio) × stopword-density factor. Fixed evaluation order, all double.

    ``toks``: pass a PRE-STAGED token-array column to evaluate the
    tokenizer once per row (see ``with_quality_score``); the default
    single-Column form duplicates it 4× (n_tok + three stopword counts) —
    higher-order functions are not CSE'd by codegen."""
    c = F.col(text) if isinstance(text, str) else text
    if toks is None:
        toks = tokens(c)
    n_tok = F.size(toks).cast("double")
    len_c = F.length(c).cast("double")
    punct = len_c - F.length(F.regexp_replace(c, "[.,;:!?]", "")).cast("double")
    # guards: an empty string / zero-token doc must score 0.0, not abort
    # the job with ANSI DIVIDE_BY_ZERO (the length factor already zeroes
    # the product, so the guarded ratios never change a real doc's score)
    punct_ratio = F.when(len_c > 0, punct / len_c).otherwise(F.lit(0.0))
    stop_hits = (count_token(toks, "the") + count_token(toks, "a") + count_token(toks, "of")).cast("double")
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    return F.round(
        F.least(F.lit(1.0), n_tok / F.lit(100.0))
        * (F.lit(1.0) - punct_ratio)
        * (F.lit(0.5) + F.least(stop_ratio, F.lit(0.5))),
        4,
    )


def with_quality_score(df, text_col: str, out: str = "score"):
    """Staged quality score: one tokenizer evaluation per row (the
    single-Column form runs it 4×). Identical arithmetic → identical
    values; only the evaluation count changes."""
    if "_qs_toks" in df.columns:
        raise ValueError("with_quality_score staging column _qs_toks already exists")
    d = df.withColumn("_qs_toks", tokens(F.col(text_col)))
    return d.withColumn(
        out, quality_score(text_col, toks=F.col("_qs_toks"))
    ).drop("_qs_toks")


def bigrams(toks: Column) -> Column:
    """All adjacent word bigrams (space-joined). Requires size >= 2;
    callers filter shorter docs first (sequence() would descend)."""
    return word_shingles(toks, 2)


def token_blocks(toks: Column, block: int = 16) -> Column:
    """md5 hashes of consecutive non-overlapping ``block``-token windows
    (trailing partial block dropped) — the unit of block-level dedup.
    Requires size >= block; callers filter shorter docs first. Oracle twin:
    list_transform(range(0, len(w) // B), i -> md5(array_to_string(w[i*B+1 : i*B+B], ' ')))."""
    n_blocks = (F.size(toks) / F.lit(block)).cast("long")
    return F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i * block + 1, block))),
    )


# PII / deny-list redaction ------------------------------------------------

# Patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded repeats, \b.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("phone", r"\+?[0-9][0-9() .-]{7,}[0-9]"),
)


def match_count(text: str | Column, pattern: str) -> Column:
    """Number of non-overlapping matches of ``pattern`` (long). Oracle twin:
    len(regexp_extract_all(t, p))."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0))).cast("long")


def redact(
    text: str | Column,
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
    token: str = "[PII]",
) -> Column:
    """Replace every match of every pattern with ``token`` — the PII-scrub
    stage of a training-data pipeline (emails, SSNs, IPs, phone numbers by
    default; callers append deny-list entity patterns for dictionary-based
    scrubbing). Chained JVM-side regexp_replace — codegen'd, no UDF; order
    is the tuple order, so earlier patterns see the original text first.
    Oracle twin: nested regexp_replace(..., 'g')."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat in patterns:
        c = F.regexp_replace(c, pat, token)
    return c
