"""Differential test for functions/text.py: Spark column formulas vs
independent pure-Python reimplementations over a deterministic corpus of
edge-case strings (empty, punctuation-only, unicode, repeated tokens).
One Spark job for the whole batch — not per-example."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from mdio_cpp_spark.functions import text

CASES = [
    "",
    "   ",
    "the quick brown fox",
    "a a a a a a a a",
    "Punctuation!!! heavy??? text... here, truly; yes: no",
    "UPPER lower MiXeD 123 456abc",
    "tab\tand\nnewline separated words",
    "unicode café naïve über straße",
    "der und die der und die der und die",
    "le la et le la et",
    "single",
    "x " * 40,  # 40 repeated tokens
    "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18",
]


def py_tokens(s: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def py_bigrams(toks: list[str]) -> list[str]:
    return [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def py_blocks(toks: list[str], block: int = 16) -> list[str]:
    return [
        hashlib.md5(" ".join(toks[i * block : (i + 1) * block]).encode()).hexdigest()
        for i in range(len(toks) // block)
    ]


def py_fingerprint(s: str) -> str:
    return hashlib.md5(" ".join(sorted(set(py_tokens(s)))).encode()).hexdigest()


def test_text_functions_match_python(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)], "id long, s string")
    toks = text.tokens(F.col("s"))
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            toks.alias("toks"),
            text.token_count(F.col("s")).alias("n"),
            text.fingerprint(F.col("s")).alias("fp"),
            F.when(F.size(toks) >= 2, text.bigrams(toks)).alias("bg"),
            F.when(F.size(toks) >= 16, text.token_blocks(toks, 16)).alias("blk"),
        ).collect()
    }
    for i, s in enumerate(CASES):
        ref = py_tokens(s)
        row = out[i]
        assert row["toks"] == ref, f"tokens mismatch for {s!r}"
        assert row["n"] == len(ref)
        assert row["fp"] == py_fingerprint(s)
        if len(ref) >= 2:
            assert row["bg"] == py_bigrams(ref), f"bigrams mismatch for {s!r}"
        if len(ref) >= 16:
            assert row["blk"] == py_blocks(ref), f"blocks mismatch for {s!r}"


def test_lang_id_matches_marker_argmax(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)], "id long, s string")
    got = {r["id"]: r["lang"] for r in df.select("id", text.lang_id(F.col("s")).alias("lang")).collect()}
    markers = {"en": ("the", "a", "of"), "de": ("der", "und", "die"),
               "fr": ("le", "la", "et"), "es": ("el", "los", "y")}
    for i, s in enumerate(CASES):
        toks = py_tokens(s)
        scores = {L: sum(toks.count(m) for m in ms) for L, ms in markers.items()}
        best = max(["en", "de", "fr", "es"], key=lambda L: (scores[L], -["en", "de", "fr", "es"].index(L)))
        assert got[i] == best, f"lang mismatch for {s!r}: {got[i]} vs {best} ({scores})"


def test_pii_redaction_patterns(spark):
    cases = [
        (0, "mail me at jane.doe+x@example.co.uk today",
         "mail me at [PII] today", 1),
        # hits are counted PER PATTERN on the original text, so the SSN and
        # the IP each also match the broad phone pattern: 4 hits, 2 spans
        (1, "ssn 123-45-6789 and ip 10.0.255.7 here",
         "ssn [PII] and ip [PII] here", 4),
        (2, "call +1 (415) 555-0100 now", "call [PII] now", 1),
        (3, "no sensitive content here", "no sensitive content here", 0),
        (4, "two mails a@b.io c@d.org", "two mails [PII] [PII]", 2),
    ]
    df = spark.createDataFrame([(i, s) for i, s, _, _ in cases], "id long, s string")
    hits = None
    for _, pat in text.PII_PATTERNS:
        c = text.match_count("s", pat)
        hits = c if hits is None else hits + c
    out = {
        r["id"]: (r["red"], r["hits"])
        for r in df.select(
            "id", text.redact("s").alias("red"), hits.alias("hits")
        ).collect()
    }
    for i, _, want_red, want_hits in cases:
        assert out[i] == (want_red, want_hits), f"case {i}: {out[i]}"


def test_hash_split_deterministic_and_complete(spark):
    from mdio_cpp_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    a = {r["id"]: r["split"] for r in hash_split(df, "id", cut=0.8).collect()}
    b = {r["id"]: r["split"]
         for r in hash_split(df.repartition(7), "id", cut=0.8).collect()}
    assert a == b  # membership is a pure function of the id
    n_train = sum(1 for v in a.values() if v == "train")
    assert 0.7 * 500 < n_train < 0.9 * 500  # cut lands near the target rate
    assert set(a.values()) == {"train", "val"}


def test_bpe_merge_conserves_symbol_count(spark):
    """BPE invariant: adopting a merge with weighted frequency f reduces
    the corpus-wide symbol count by EXACTLY f (each occurrence of the pair
    collapses two symbols into one). Pins both the pair counting and the
    sentinel-wrapped replace against each other — a miscounted pair or an
    overlapping/partial rewrite breaks the equality."""
    from mdio_cpp_spark.plans.pipeline import _bpe_learn

    rows = [
        ("low",), ("low",), ("low",), ("lower",), ("lower",),
        ("newest",), ("newest",), ("newest",), ("newest",), ("widest",),
    ]
    vocab = (
        spark.createDataFrame(rows, "w string")
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
        .select("w", "c",
                F.rtrim(F.regexp_replace("w", "(.)", "_$1_ ")).alias("sym"))
    )

    def total_symbols(df):
        return df.select(
            F.sum(F.col("c") * F.size(F.split("sym", " "))).alias("n")
        ).collect()[0]["n"]

    cur = vocab
    for _ in range(3):
        merges, nxt = _bpe_learn(cur, 1)
        (_pat, _rep, freq), = merges
        assert total_symbols(cur) - total_symbols(nxt) == freq
        cur = nxt
    # classic corpus: the first merges must involve the 'es'/'est' mass
    # (newest x4 + widest -> 'e s' appears 5 times weighted)
    merges, _ = _bpe_learn(vocab, 1)
    assert merges[0][2] >= 5


def test_staged_forms_match_inline_forms(spark):
    """with_lang_id / with_quality_score are pure evaluation-count
    optimizations: on a corpus with empty, punctuation-only, mixed-language
    and long docs they must equal the single-Column forms row for row."""
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat of the house"),
         (1, "der hund und die katze und der vogel"),
         (2, "le chien et la souris et le chat"),
         (3, "el gato y los perros y el raton"),
         (4, ""),
         (5, "!!! ... ;;;"),
         (6, "a " * 250),
         (7, "woRd CaSe MiXeD the of a der und le et el y los")],
        "doc_id long, text string")
    inline = docs.select(
        "doc_id",
        text.lang_id("text").alias("pred_lang"),
        text.quality_score("text").alias("score"),
    ).orderBy("doc_id").collect()
    staged = (
        text.with_quality_score(text.with_lang_id(docs, "text"), "text")
        .select("doc_id", "pred_lang", "score")
        .orderBy("doc_id")
        .collect()
    )
    assert staged == inline
    # and the staged frames leave no helper columns behind
    cols = text.with_lang_id(docs, "text").columns
    assert cols == ["doc_id", "text", "pred_lang"]
    assert text.with_quality_score(docs, "text").columns == ["doc_id", "text", "score"]
