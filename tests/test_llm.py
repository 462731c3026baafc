"""LLM-op invariants beyond oracle parity (SURVEY.md §5 items 3-4):
LSH precision/recall vs in-Spark brute force, dedup idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from catena_spark import tables
from catena_spark.functions.vectors import cosine
from catena_spark.functions.text import doc_tokens
from catena_spark.operators import llm
from tests.conftest import SF_SMALL


def _brute_jaccard_pairs(spark, sf_dir, threshold):
    d = tables.load(spark, sf_dir, "documents").withColumn(
        "t", F.lower(F.trim("text"))
    )
    g = d.select("doc_id", doc_tokens(F.col("t"), distinct=True).alias("toks"))
    a = g.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    b = g.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    pairs = a.join(F.broadcast(b), F.col("doc_a") < F.col("doc_b"))
    j = F.size(F.array_intersect("ta", "tb")) / F.size(
        F.array_union("ta", "tb")
    ).cast("double")
    return pairs.select("doc_a", "doc_b", F.round(j, 6).alias("jaccard")).where(
        F.col("jaccard") >= threshold
    )


def test_minhash_precision_and_recall(spark):
    truth = {
        (r.doc_a, r.doc_b) for r in _brute_jaccard_pairs(spark, SF_SMALL, 0.9).collect()
    }
    found = {
        (r.doc_a, r.doc_b) for r in llm.llm_minhash_pairs(spark, SF_SMALL).collect()
    }
    assert found <= truth, f"false positives after verify: {sorted(found - truth)[:5]}"
    assert truth, "fixture should contain J>=0.9 pairs"
    recall = len(found & truth) / len(truth)
    assert recall >= 0.95, f"LSH recall {recall:.3f} < 0.95 ({len(truth)} true pairs)"


def test_ann_lsh_recall(spark):
    truth = {
        (r.vec_a, r.vec_b)
        for r in llm.llm_embedding_near_dup(spark, SF_SMALL).collect()
    }
    found = {(r.vec_a, r.vec_b) for r in llm.llm_ann_lsh(spark, SF_SMALL).collect()}
    assert found <= truth  # exact verify => no false positives
    assert truth
    recall = len(found & truth) / len(truth)
    assert recall >= 0.7, f"hyperplane-LSH recall {recall:.3f} < 0.7"


def test_exact_dedup_idempotent(spark):
    out = llm.llm_exact_dedup(spark, SF_SMALL)
    # survivors are unique by hash; re-dedup of survivors is a no-op
    assert out.count() == out.select("text_hash").distinct().count()
    assert out.where(F.col("n_copies") < 1).count() == 0


def test_simhash_near_dup_hamming(spark):
    """Token-set duplicates must collide exactly in SimHash space."""
    fp = llm.llm_simhash_fingerprint(spark, SF_SMALL)
    dups = llm.llm_token_set_dup_pairs(spark, SF_SMALL)
    j = (
        dups.join(fp.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("simhash", "ha"), "doc_a")
        .join(fp.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("simhash", "hb"), "doc_b")
    )
    assert j.where(F.col("ha") != F.col("hb")).count() == 0


def test_ann_ivf_recall_vs_brute_force(spark):
    """IVF probe search must recover most of the exact top-5 sets."""
    from catena_spark.operators.llm import llm_ann_ivf, llm_cosine_topk

    exact = {
        (r["qid"], r["nid"]) for r in llm_cosine_topk(spark, SF_SMALL).collect()
    }
    approx = {
        (r["qid"], r["nid"]) for r in llm_ann_ivf(spark, SF_SMALL).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall {recall:.2f} below gate"


def test_token_packing_sharded_form_matches_global(spark):
    """The 100 TB variant of llm_token_packing: per-shard windows plus a
    per-shard base offset must reproduce the global single-window result
    exactly — this is the distributivity that makes packing
    embarrassingly parallel at scale (docstring contract)."""
    from pyspark.sql import Window

    from catena_spark import tables
    from catena_spark.functions.text import doc_tokens
    from catena_spark.operators.llm import llm_token_packing

    d = tables.load(spark, SF_SMALL, "documents").withColumn(
        "t", F.lower(F.trim("text"))
    )
    toks = d.select(
        "doc_id",
        F.size(doc_tokens(F.col("t"))).cast("long").alias("n_tok"),
        (F.col("doc_id") / 16).cast("long").alias("shard"),
    )
    # per-shard running start + per-shard token totals
    w_in = (
        Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = toks.withColumn("local_start", F.sum("n_tok").over(w_in) - F.col("n_tok"))
    shard_tot = toks.groupBy("shard").agg(F.sum("n_tok").alias("tot"))
    w_base = (
        Window.orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = shard_tot.withColumn(
        "base", F.coalesce(F.sum("tot").over(w_base), F.lit(0))
    ).select("shard", "base")
    sharded = (
        local.join(F.broadcast(base), "shard")
        .withColumn("start", F.col("base") + F.col("local_start"))
        .select(
            "doc_id",
            "n_tok",
            F.floor(F.col("start") / 512).cast("long").alias("seq_id"),
            (F.col("start") % 512).cast("long").alias("seq_offset"),
        )
    )
    g = {r["doc_id"]: (r["n_tok"], r["seq_id"], r["seq_offset"])
         for r in llm_token_packing(spark, SF_SMALL).collect()}
    s = {r["doc_id"]: (r["n_tok"], r["seq_id"], r["seq_offset"])
         for r in sharded.collect()}
    assert g == s


def test_embedding_near_dup_size_guard(spark):
    """VERDICT r9 item 5 + ADVICE r10: the declared O(n^2) recall
    oracle must fail loud above its vector cap (pointing callers at
    llm_ann_lsh), accept an explicit override, and leave the default
    fixture-scale path — and hence the driver hash — untouched. The
    guard is now IN THE PLAN: construction is lazy (no eager job, no
    exception at build) and the raise fires when the query executes."""
    import pytest

    # construction must be side-effect-free even over the cap (ADVICE
    # r10: the old eager limit().count() probe ran a Spark job inside
    # every registry/plan-lint build)
    over = llm.llm_embedding_near_dup(spark, SF_SMALL, max_rows=10)
    # ... and executing it must raise with a pointer to the banded twin
    with pytest.raises(Exception, match="llm_ann_lsh"):
        over.count()
    # cap=0 disables the guard entirely
    assert llm.llm_embedding_near_dup(spark, SF_SMALL, max_rows=0).count() > 0
    # default cap (10^4) passes fixture scale — same rows as ungated
    gated = llm.llm_embedding_near_dup(spark, SF_SMALL)
    ungated = llm.llm_embedding_near_dup(spark, SF_SMALL, max_rows=0)
    assert sorted(map(tuple, gated.collect())) == sorted(
        map(tuple, ungated.collect())
    )


def test_embedding_near_dup_env_cap(spark, monkeypatch):
    """Env override path: CATENA_NEAR_DUP_MAX_ROWS gates like max_rows;
    empty string falls back to the default instead of crashing
    (ADVICE r10)."""
    import pytest

    monkeypatch.setenv("CATENA_NEAR_DUP_MAX_ROWS", "10")
    with pytest.raises(Exception, match="exceeds 10 "):
        llm.llm_embedding_near_dup(spark, SF_SMALL).count()
    monkeypatch.setenv("CATENA_NEAR_DUP_MAX_ROWS", "0")
    assert llm.llm_embedding_near_dup(spark, SF_SMALL).count() > 0
    # empty = default (10^4): fixture scale passes
    monkeypatch.setenv("CATENA_NEAR_DUP_MAX_ROWS", "")
    assert llm.llm_embedding_near_dup(spark, SF_SMALL).count() > 0
    monkeypatch.setenv("CATENA_NEAR_DUP_MAX_ROWS", "ten")
    with pytest.raises(ValueError, match="CATENA_NEAR_DUP_MAX_ROWS"):
        llm.llm_embedding_near_dup(spark, SF_SMALL)


def test_winnowing_window_state_is_doc_bounded_at_production_conf(spark):
    """VERDICT r12 item 4: pin the SCALE.md r12 forced-spill
    adjudication as a test instead of prose. The r12 stress axis OOM'd
    llm_winnowing_fingerprint under a synthetic regime only: window
    spill threshold forced to 64 ROWS x UnsafeSorterSpillReader's
    >= 1 MB buffer floor x ~500 per-doc window partitions reopened
    sequentially inside one AQE-coalesced task ~= 4.5 GB of dead reader
    buffers. This test proves the pathology cannot arise at the
    PRODUCTION window-buffer conf:

    (a) every Window node in the optimized plan partitions by doc_id —
        window state is per-doc, never corpus-sized, at ANY scale;
    (b) per-doc window rows = grams/doc = length(t) - 3, whose corpus
        max at the driver scale sits several times below the production
        in-memory threshold (spark.sql.windowExec.buffer.in.memory.
        threshold, default 4096) — the buffer never converts to a spill
        sorter, so there are no spill readers to leak.

    scripts/stress_window.sh's WINDOW_EXEMPT_KEYS split cites this test
    as the production-threshold argument for the exemption.
    """
    from tests.conftest import SF_DRIVER

    df = llm.llm_winnowing_fingerprint(spark, SF_DRIVER)

    def window_nodes(node):
        out = []
        if node.nodeName() == "Window":
            out.append(node)
        ch = node.children()
        for i in range(ch.length()):
            out.extend(window_nodes(ch.apply(i)))
        return out

    wins = window_nodes(df._jdf.queryExecution().optimizedPlan())
    assert wins, "winnowing is window-based; the plan must contain Window nodes"
    for w in wins:
        spec = w.partitionSpec()
        assert not spec.isEmpty(), "per-doc state requires a partitioned window"
        assert "doc_id" in spec.apply(0).toString()

    threshold = int(
        spark.conf.get(
            "spark.sql.windowExec.buffer.in.memory.threshold", "4096"
        )
    )
    max_grams = (
        llm._docs_norm(spark, SF_DRIVER)
        .where(F.length("t") >= 4)
        .agg(F.max(F.length("t") - 3).alias("g"))
        .collect()[0]
        .g
    )
    # wide margin: even 4x the observed per-doc max stays in the
    # in-memory buffer, so production runs never touch the spill path
    # this operator was exempted from in the synthetic stress regime
    assert max_grams * 4 < threshold, (max_grams, threshold)


def test_null_vector_doctrine(spark, tmp_path):
    """NULL-vector doctrine (r16, found by the missing-ARRAY drift
    cell): a row whose embedding is NULL — an older writer generation
    written before the column existed — contributes NOTHING to vector
    operators: not a centroid component, not a centroid-count
    denominator, not a k-means assignment, not a semdedup cluster
    member. Before the guards, NULL distances hit the engines'
    OPPOSITE null-sort defaults (Spark ASC = NULLS FIRST, DuckDB ASC =
    NULLS LAST) and the oracle's count(*) counted ghost rows — three
    hash mismatches under drift (/tmp/r16_missing_array_probe.log)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from catena_spark import tables
    from catena_spark.operators.llm import (
        llm_centroid_by_label,
        llm_kmeans_assign,
        llm_semdedup_representatives,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    for t in tables.TABLES:
        if t != "embeddings":
            shutil.copy(f"{SF_SMALL}/{t}.parquet", str(sf / f"{t}.parquet"))
    full = pq.read_table(f"{SF_SMALL}/embeddings.parquet")
    n = full.num_rows
    # vec_id 3 (a centroid seed) and the back half lose their vectors —
    # the older-generation NULL-fill shape read_drifted produces
    null_mask = pa.array(
        [bool(i == 3 or i >= n // 2) for i in range(n)]
    )
    emb = pa.compute.if_else(
        null_mask,
        pa.scalar(None, full.schema.field("embedding").type),
        full.column("embedding").combine_chunks(),
    )
    pq.write_table(
        full.set_column(
            full.schema.get_field_index("embedding"), "embedding", emb
        ),
        str(sf / "embeddings.parquet"),
    )
    kept = {
        i for i in range(n) if not (i == 3 or i >= n // 2)
    }

    asg = llm_kmeans_assign(spark, str(sf))
    got = {r.vec_id for r in asg.select("vec_id").collect()}
    assert got == kept, "NULL-embedding rows must not be assigned"
    cids = {r.cluster_id for r in asg.select("cluster_id").distinct().collect()}
    assert 3 not in cids, "a NULL-embedding seed must not serve as centroid"

    sem = llm_semdedup_representatives(spark, str(sf))
    assert {r.vec_id for r in sem.select("vec_id").collect()} == kept

    cen = llm_centroid_by_label(spark, str(sf)).collect()
    # denominator check: recompute one (label, pos) cell from the kept
    # vectors only; the oracle's count(*) used to count ghost rows
    import collections

    sums: dict = collections.defaultdict(int)
    cnts: dict = collections.Counter()
    labels = full.column("label").to_pylist()
    vecs = full.column("embedding").to_pylist()
    for i in sorted(kept):
        cnts[labels[i]] += 1
        for pos, x in enumerate(vecs[i], start=1):
            sums[(labels[i], pos)] += round(float(x) * 1_000_000)
    want = {
        (r.label, r.pos): r.c for r in cen
    }
    for (lab, pos), s in list(sums.items())[:64]:
        assert want[(lab, pos)] == s / (1_000_000 * cnts[lab])
