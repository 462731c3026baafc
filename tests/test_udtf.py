"""G5/G6 surface tests: UDTFs and SQL-registered functions actually
work from the spark.sql entry point (SURVEY.md §2-G5/G6)."""

from __future__ import annotations

import pytest

from catena_spark import tables
from catena_spark.functions.udtfs import register_all
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    register_all(spark)
    tables.load(spark, SF_SMALL, "documents").createOrReplaceTempView("documents")
    tables.load(spark, SF_SMALL, "embeddings").createOrReplaceTempView("embeddings")


def test_tokenize_lateral_join(spark):
    out = spark.sql(
        """
        SELECT d.doc_id, t.pos, t.term, t.is_word
        FROM documents d, LATERAL tokenize(d.text) t
        WHERE d.doc_id < 3
        ORDER BY d.doc_id, t.pos
        """
    ).collect()
    assert out
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.sql("SELECT * FROM documents WHERE doc_id < 3").collect()
    }
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        # positions are dense 0..n-1 and terms reassemble the lowered text
        assert [r["pos"] for r in rows] == list(range(len(rows)))
        assert " ".join(r["term"] for r in rows) == " ".join(
            docs[doc_id].lower().split()
        )
        assert all(r["is_word"] for r in rows)  # corpus is pure words


def test_char_ngrams_distinct_and_complete(spark):
    out = spark.sql(
        "SELECT g.ngram FROM LATERAL char_ngrams('spark spark', 3) g"
    ).collect()
    grams = [r["ngram"] for r in out]
    expected = {"spark spark"[i : i + 3] for i in range(len("spark spark") - 2)}
    assert set(grams) == expected
    assert len(grams) == len(set(grams))


def test_cosine_sim_sql_matches_hof(spark):
    from pyspark.sql import functions as F

    from catena_spark.functions.vectors import cosine

    sql_rows = spark.sql(
        """
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               round(cosine_sim(a.embedding, b.embedding), 6) AS c
        FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id < 10
        """
    ).collect()
    e = tables.load(spark, SF_SMALL, "embeddings")
    a = e.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    hof_rows = (
        a.join(b, F.col("ib") == F.col("ia") + 1)
        .where(F.col("ia") < 10)
        .select("ia", "ib", F.round(cosine("ea", "eb"), 6).alias("c"))
    ).collect()
    assert {(r["ia"], r["ib"], r["c"]) for r in sql_rows} == {
        (r["ia"], r["ib"], r["c"]) for r in hof_rows
    }
