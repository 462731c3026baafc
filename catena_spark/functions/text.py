"""Text-analysis column helpers for the LLM pipeline (SURVEY.md §2-E4):
tokenization, character n-grams, quality scoring, language-ID heuristic.
All built-in expression compositions — JVM-side, codegen-friendly.

Engine-portable hashing note: Spark's hash()/xxhash64() and DuckDB's
hash() are different algorithms, so any operator that must be
oracle-checkable derives hashes from md5 hex strings (identical on both
engines); xxhash64 is reserved for Spark-only paths (MinHash/LSH) where
determinism across *Spark workers* is what matters — it's seeded and
shuffle-invariant.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def doc_tokens(text: Column | str, distinct: bool = False) -> Column:
    """Whitespace tokens; the fixture corpus is single-space separated."""
    toks = F.split(text, " ")
    return F.array_distinct(toks) if distinct else toks


def regex_tokens(text: Column | str) -> Column:
    """BPE-ish tokenization: word pieces OR single non-space symbols —
    the standard pre-tokenizer regex family, built-in regexp engine."""
    return F.regexp_extract_all(F.lit(None).cast("string") if text is None else F.col(text) if isinstance(text, str) else text, F.lit(r"\w+|[^\w\s]"), 0)


def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams via sequence+transform (no UDF).

    Texts shorter than ``n`` yield an EMPTY array: a bare
    ``sequence(1, length-n+1)`` would hit Spark's descending-step
    default when start > stop (sequence(1,0) == [1,0]) and fabricate
    grams DuckDB's generate_series(1,0) (empty) never produces — the
    guard keeps both engines at [] (ADVICE r1).
    """
    col = F.col(text) if isinstance(text, str) else text
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(1))),
        lambda i: col.substr(i, F.lit(n)),
    )
    return F.when(F.length(col) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams(text: Column | str, n: int = 5) -> Column:
    """Distinct word n-grams (space-tokenized), the word-level sibling
    of char_ngrams and the ONE definition shared by the contamination
    and novelty keys (r5, self-review — two independent constructions
    previously had to stay semantically identical by hand). Splits the
    text once; texts with fewer than ``n`` words yield an EMPTY array
    (same descending-sequence guard as char_ngrams)."""
    col = F.col(text) if isinstance(text, str) else text
    ws = F.split(col, " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(ws) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(ws, i, n), " "),
    )
    return F.when(F.size(ws) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def quality_score(text: Column | str) -> Column:
    """Deterministic doc-quality heuristic in [0,1]:
    0.4*length_score + 0.4*lexical_diversity + 0.2*(1 - punct_ratio).

    length_score saturates at 50 tokens; diversity = distinct/total
    tokens; punct_ratio = non-word-non-space chars / chars.
    """
    col = F.col(text) if isinstance(text, str) else text
    toks = F.split(col, " ")
    n_tok = F.size(toks).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    diversity = n_distinct / n_tok
    punct = F.length(F.regexp_replace(col, r"[\w\s]", "")).cast("double")
    punct_ratio = punct / F.length(col).cast("double")
    return F.round(
        F.lit(0.4) * len_score + F.lit(0.4) * diversity + F.lit(0.2) * (1 - punct_ratio),
        6,
    )


#: the same heuristic as DuckDB SQL (oracle side), parameterized on the column
QUALITY_SQL = (
    "round(0.4 * least(CAST(len(string_split({c}, ' ')) AS DOUBLE) / 50.0, 1.0)"
    " + 0.4 * (CAST(len(list_distinct(string_split({c}, ' '))) AS DOUBLE)"
    "          / CAST(len(string_split({c}, ' ')) AS DOUBLE))"
    " + 0.2 * (1 - CAST(length(regexp_replace({c}, '[\\w\\s]', '', 'g')) AS DOUBLE)"
    "              / CAST(length({c}) AS DOUBLE)), 6)"
)


def lang_id(text: Column | str) -> Column:
    """Character/function-word n-gram language heuristic (SURVEY.md
    §2-E4 'lang-ID'): scores a handful of high-frequency marker patterns
    per language and picks the max — the classic n-gram-profile approach
    collapsed to its top discriminators, as pure CASE logic.

    On the synthetic corpus (English analytics vocabulary) it degenerates
    to 'en'/'unknown', which is the honest answer; the operator shape
    (portable, declarative, no UDF) is what scales.
    """
    col = F.col(text) if isinstance(text, str) else text
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))

    def hits(*pats: str) -> Column:
        score = F.lit(0)
        for p in pats:
            score = score + F.when(padded.contains(p), 1).otherwise(0)
        return score

    en = hits(" the ", " and ", " of ", "th", "ing")
    de = hits(" der ", " und ", " die ", "sch", "ei")
    fr = hits(" le ", " et ", " les ", "ou", "é")
    es = hits(" el ", " y ", " los ", "ción", "ñ")
    zh = F.when(col.rlike("[一-鿿]"), F.lit(10)).otherwise(F.lit(0))
    best = F.greatest(en, de, fr, es, zh)
    return (
        F.when(best == 0, "unknown")
        .when(zh == best, "zh")
        .when(en == best, "en")
        .when(de == best, "de")
        .when(fr == best, "fr")
        .otherwise("es")
    )
