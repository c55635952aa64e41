"""Properties of the round-11 rows: SemDeDup cluster-prune invariants
and bigram-LM score construction (both also value-hash-checked against
their DuckDB oracles by the driver; these pin the semantics that the
hash alone wouldn't explain)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_semdedup_invariants(spark):
    from dend_covid19_spark.operators.kmeans import (
        SEMDEDUP_COS_T,
        semdedup_cluster_prune,
    )

    out = semdedup_cluster_prune(spark, SF_DIR).localCheckpoint()
    # every vector appears exactly once with a verdict
    from dend_covid19_spark.catalog import load_table

    n_vec = load_table(spark, "embeddings", SF_DIR).count()
    assert out.count() == n_vec
    assert out.select("vec_id").distinct().count() == n_vec
    # keep-first: the smallest vec_id of each cluster has no lower-id
    # mate, so it can never be pruned
    mins = out.groupBy("cluster").agg(F.min("vec_id").alias("vec_id"))
    assert out.join(mins, ["cluster", "vec_id"]).where("is_pruned").count() == 0
    # soundness: every pruned vector really has a lower-id cluster-mate
    # within the threshold (recompute one witness per pruned vector)
    emb = load_table(spark, "embeddings", SF_DIR).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    joined = out.join(emb, "vec_id")
    x = joined.select(
        F.col("vec_id").alias("x_id"), F.col("v").alias("x_v"),
        "cluster", "is_pruned",
    )
    y = joined.select(
        F.col("vec_id").alias("y_id"), F.col("v").alias("y_v"), "cluster"
    )
    cos = (
        "round(aggregate(zip_with(x_v, y_v, (a, b) -> a * b), 0D,"
        " (acc, p) -> acc + p) / (sqrt(aggregate(x_v, 0D, (acc, a) -> acc + a * a))"
        " * sqrt(aggregate(y_v, 0D, (acc, a) -> acc + a * a))), 6)"
    )
    witnesses = (
        x.where("is_pruned")
        .join(y, "cluster")
        .where(F.col("y_id") < F.col("x_id"))
        .where(F.expr(cos) >= F.expr(SEMDEDUP_COS_T))
        .select("x_id")
        .distinct()
    )
    n_pruned = out.where("is_pruned").count()
    assert witnesses.count() == n_pruned


def test_bigram_lm_score_construction(spark):
    from dend_covid19_spark.catalog import load_table
    from dend_covid19_spark.plans.textops import bigram_lm_doc_score

    out = bigram_lm_doc_score(spark, SF_DIR).localCheckpoint()
    docs = load_table(spark, "documents", SF_DIR).select(
        "doc_id", F.expr("size(split(text, ' '))").alias("n_tok")
    )
    # one row per doc with >= 2 tokens; n_bigrams = n_tok - 1
    j = out.join(docs, "doc_id")
    assert j.where("n_bigrams != n_tok - 1").count() == 0
    assert out.count() == docs.where("n_tok >= 2").count()
    # avg is the exact integer floor of sum / n
    assert (
        out.where("avg_cond_ppm != CAST(sum_cond_ppm / n_bigrams AS BIGINT)"
                  " AND avg_cond_ppm != sum_cond_ppm DIV n_bigrams").count() == 0
    )
    # ppm bounds: every conditional probability <= 1, so avg <= 1e6;
    # and every observed bigram has c_ab >= 1 so the score is positive
    bad = out.where("avg_cond_ppm <= 0 OR avg_cond_ppm > 1000000")
    assert bad.count() == 0


def test_semdedup_incremental_is_subset_of_full_pairs(spark):
    """The incremental identity pin (the dedup_incremental_delta
    discipline): the delta probe's matches must be EXACTLY the
    delta-x-corpus subset of the full within-cluster qualifying pair
    set — nothing extra, nothing missed."""
    from pyspark.sql import functions as F

    from dend_covid19_spark.catalog import load_table
    from dend_covid19_spark.operators.kmeans import (
        SEMDEDUP_DELTA_COS_T,
        SEMDEDUP_DELTA_MOD,
        _assign,
        _trained_codebook,
        semdedup_incremental_delta,
    )

    got = {
        (r.delta_vec, r.corpus_vec)
        for r in semdedup_incremental_delta(spark, SF_DIR).collect()
    }
    emb = load_table(spark, "embeddings", SF_DIR).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    from dend_covid19_spark.operators.kmeans import SEMDEDUP_SEED_IDS

    cents = _trained_codebook(spark, emb, SF_DIR, SEMDEDUP_SEED_IDS)
    fin = _assign(emb, cents).select("vec_id", "v", "cluster")
    a = fin.select(F.col("vec_id").alias("x_id"), F.col("v").alias("x_v"), "cluster")
    b = fin.select(F.col("vec_id").alias("y_id"), F.col("v").alias("y_v"), "cluster")
    cos = (
        "round(aggregate(zip_with(x_v, y_v, (p, q) -> p * q), 0D,"
        " (acc, p) -> acc + p) / (sqrt(aggregate(x_v, 0D, (acc, p) -> acc + p * p))"
        " * sqrt(aggregate(y_v, 0D, (acc, p) -> acc + p * p))), 6)"
    )
    want = {
        (r.x_id, r.y_id)
        for r in (
            a.join(b, "cluster")
            .where(F.col("x_id") % SEMDEDUP_DELTA_MOD == 0)
            .where(F.col("y_id") % SEMDEDUP_DELTA_MOD != 0)
            .where(F.expr(cos) >= F.expr(SEMDEDUP_DELTA_COS_T))
            .select("x_id", "y_id")
            .collect()
        )
    }
    assert got == want
