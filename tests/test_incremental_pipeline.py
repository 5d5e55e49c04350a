"""Incremental-vs-rebuild differential for the curation lifecycle: a near-dup
index maintained across ingest batches must be INDISTINGUISHABLE from one
rebuilt from scratch — both the persisted band index and the candidate-pair
algebra pairs(A∪B) = pairs(A) ∪ (B x A) ∪ pairs(B)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_adcom_spark.queries.dedup import minhash_band_rows


def _split_corpus(spark, sf_dir, tmp_path):
    """Write the fixture docs as corpus (doc_id % 5 != 4) and batch (== 4)
    table dirs, plus pass through the full dir."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a, b = str(tmp_path / "corpus"), str(tmp_path / "batch")
    docs.filter(F.col("doc_id") % 5 != 4).write.mode("overwrite").parquet(
        f"{a}/documents.parquet"
    )
    docs.filter(F.col("doc_id") % 5 == 4).write.mode("overwrite").parquet(
        f"{b}/documents.parquet"
    )
    return a, b


def _pairs(bands):
    x = bands.select(F.col("doc_id").alias("a"), "band", "bkey")
    y = bands.select(F.col("doc_id").alias("b"), "band", "bkey")
    return (
        x.join(y, ["band", "bkey"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def test_incremental_index_equals_rebuild(spark, sf_dir, tmp_path):
    a_dir, b_dir = _split_corpus(spark, sf_dir, tmp_path)

    # t0: persist the corpus index; t1: append ONLY the batch's band rows
    index_path = str(tmp_path / "band_index")
    minhash_band_rows(spark, a_dir).write.mode("overwrite").parquet(index_path)
    minhash_band_rows(spark, b_dir).write.mode("append").parquet(index_path)

    stored = spark.read.parquet(index_path)
    rebuilt = minhash_band_rows(spark, sf_dir)
    got = {tuple(r) for r in stored.collect()}
    want = {tuple(r) for r in rebuilt.collect()}
    assert got == want, "incrementally-maintained index diverged from rebuild"


def test_incremental_pair_algebra_closes(spark, sf_dir, tmp_path):
    a_dir, b_dir = _split_corpus(spark, sf_dir, tmp_path)
    old = minhash_band_rows(spark, a_dir)
    new = minhash_band_rows(spark, b_dir)

    full = {tuple(r) for r in _pairs(minhash_band_rows(spark, sf_dir)).collect()}
    within_old = {tuple(r) for r in _pairs(old).collect()}
    within_new = {tuple(r) for r in _pairs(new).collect()}
    # cross pairs: the q59 asymmetric ingest join, normalized to a < b
    cross_df = (
        new.select(F.col("doc_id").alias("n"), "band", "bkey")
        .join(old.select(F.col("doc_id").alias("o"), "band", "bkey"), ["band", "bkey"])
        .select(
            F.least("n", "o").alias("a"), F.greatest("n", "o").alias("b")
        )
        .distinct()
    )
    cross = {tuple(r) for r in cross_df.collect()}

    assert within_old | within_new | cross == full
    # the decomposition is a partition: no pair is both within and cross
    assert not (within_old | within_new) & cross
    assert cross, "fixture produced no cross-batch candidates; test is vacuous"


def test_phrase_postings_artifact_memoized(spark, sf_dir):
    """q256 persists its corpus postings ONCE per corpus fingerprint (the
    q45-chain memo law): a second build must reuse the parquet artifact —
    no new workdir generation — and return the identical relation."""
    from flink_adcom_spark import workdirs
    from flink_adcom_spark.registry import get

    import os

    tag = "phrase_postings_" + os.path.basename(sf_dir.rstrip("/"))
    first = sorted(
        tuple(r) for r in get("q256_phrase_postings_probe").build(spark, sf_dir).collect()
    )
    gen_after_first = workdirs._GENERATIONS.get(tag)
    assert gen_after_first is not None, "postings build never touched its workdir"
    second = sorted(
        tuple(r) for r in get("q256_phrase_postings_probe").build(spark, sf_dir).collect()
    )
    assert workdirs._GENERATIONS.get(tag) == gen_after_first, (
        "second build re-wrote the postings artifact instead of reusing the memo"
    )
    assert first == second
