"""Python UDTFs + SQL registration (SURVEY.md §2-G5/G6).

G5: Arrow-native table functions for true 1->n row expansion callable
from SQL (``LATERAL tokenize(text)``). The batch hot path stays on the
JVM HOFs in functions/text.py — a UDTF earns its Python crossing only
where SQL users need ad-hoc lateral expansion with per-row logic.

G6: ``register_all(spark)`` exposes the UDTFs plus a vectorized cosine
(pandas UDF over Arrow batches) under SQL names, so every E-operator
capability is reachable from the ``spark.sql`` entry point as well as
the DataFrame API.

Decorators are applied inside ``register_all`` because ``pandas_udf`` /
``udtf`` return-type parsing needs a live session; importing this module
must stay side-effect free.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession


class Tokenize:
    """Lateral tokenizer: one output row per token with its position and
    a word/punctuation flag (the BPE-ish pre-tokenizer split of
    functions/text.py:regex_tokens, as a table function)."""

    RETURN_TYPE = "pos int, term string, is_word boolean"

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        import re

        if text is None:
            return
        for i, tok in enumerate(re.findall(r"\w+|[^\w\s]", text.lower())):
            yield i, tok, tok[0].isalnum() or tok[0] == "_"


class CharNgrams:
    """Lateral distinct character-n-gram expansion (shingling for
    MinHash-style dedup, as a SQL-callable table function)."""

    RETURN_TYPE = "ngram string"

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None or n is None or n <= 0:
            return
        seen = set()
        for i in range(max(len(text) - n + 1, 0)):
            g = text[i : i + n]
            if g not in seen:
                seen.add(g)
                yield (g,)


def _cosine_sim(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine over ARRAY<FLOAT> columns for SQL callers.

    The DataFrame hot path uses the JVM fold in functions/vectors.py;
    this Arrow-batched twin exists so ``spark.sql`` users get the same
    capability without the HOF incantation.
    """
    import numpy as np

    def one(x, y):
        xa, ya = np.asarray(x, dtype="float64"), np.asarray(y, dtype="float64")
        return float(xa @ ya / (np.linalg.norm(xa) * np.linalg.norm(ya)))

    return pd.Series([one(x, y) for x, y in zip(a, b)])


def register_all(spark: SparkSession) -> None:
    """Make every G5/G6 function SQL-visible on this session."""
    from pyspark.sql.functions import pandas_udf, udtf

    spark.udtf.register("tokenize", udtf(Tokenize, returnType=Tokenize.RETURN_TYPE))
    spark.udtf.register(
        "char_ngrams", udtf(CharNgrams, returnType=CharNgrams.RETURN_TYPE)
    )
    spark.udf.register("cosine_sim", pandas_udf(_cosine_sim, "double"))


# ---------------------------------------------------------------- G5 driver key

from ..registry import query  # noqa: E402
from .. import tables  # noqa: E402


@query(
    "udtf_tokenize_lateral",
    "G5",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\\w+|[^\\w\\s]') AS tk
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           CAST(g.i - 1 AS BIGINT) AS pos,
           tk[g.i] AS term,
           regexp_matches(substring(tk[g.i], 1, 1), '[a-z0-9_]') AS is_word
    FROM toks, (SELECT unnest(generate_series(1, 4096)) AS i) g
    WHERE g.i <= len(tk)
    """,
)
def udtf_tokenize_lateral(spark, sf_dir):
    """Python UDTF through the SQL entry point (SURVEY.md §2-G5/G6):
    ``LATERAL tokenize(text)`` — true 1->n lateral expansion with per-row
    Python logic, registered on whatever session the driver brings
    (executors import the shipped package zip; ensure_runtime_conf).

    The doc_id<50 pushdown bounds the Python crossing; the oracle is
    DuckDB's regexp_extract_all + positional unnest. Scale: a UDTF is
    the slow path by design — the JVM twin (functions/text.py
    regex_tokens) serves the batch pipelines; this key proves the SQL
    surface works end-to-end.
    """
    from .udtfs import register_all

    register_all(spark)
    tables.load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, CAST(t.pos AS BIGINT) AS pos, t.term, t.is_word
        FROM documents d, LATERAL tokenize(lower(d.text)) t
        WHERE d.doc_id < 50
        """
    )
