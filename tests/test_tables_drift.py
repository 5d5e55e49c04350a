"""Schema-drift normalization contract (tables._normalize_to_declared): the
driver regenerates /root/testdata between rounds and physical types have
changed across generations, so the loader casts KNOWN value-preserving
drifts back to the declared schema and fails LOUDLY on anything else —
under a non-ANSI session a blanket cast would turn unparseable cells into
NULLs silently."""

from __future__ import annotations

import os

import pytest

from flink_adcom_spark.tables import SCHEMAS, load_table


def _write_variant(spark, sf_dir, tmp_path, table, transform_sql):
    """Copy one table into a temp sf-dir with a column type rewritten."""
    out = str(tmp_path / "sfdrift")
    os.makedirs(out, exist_ok=True)
    df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
    df.selectExpr(*transform_sql).write.mode("overwrite").parquet(
        os.path.join(out, f"{table}.parquet")
    )
    return out


def test_whitelisted_int_width_drift_is_cast_back(spark, sf_dir, tmp_path):
    # nation keys are declared INT; regenerate them as BIGINT
    drift = _write_variant(
        spark, sf_dir, tmp_path, "nation",
        ["CAST(n_nationkey AS BIGINT) AS n_nationkey", "n_name",
         "CAST(n_regionkey AS BIGINT) AS n_regionkey"],
    )
    df = load_table(spark, drift, "nation")
    assert dict(df.dtypes)["n_nationkey"] == "int"
    want = {f.name: f.dataType.simpleString() for f in SCHEMAS["nation"].fields}
    assert dict(df.dtypes) == want
    assert df.count() == spark.read.parquet(
        os.path.join(sf_dir, "nation.parquet")
    ).count()


def test_incompatible_drift_fails_loudly(spark, sf_dir, tmp_path):
    # a numeric column re-emitted as strings must raise, not become NULLs
    drift = _write_variant(
        spark, sf_dir, tmp_path, "nation",
        ["CAST(n_nationkey AS STRING) AS n_nationkey", "n_name", "n_regionkey"],
    )
    with pytest.raises(ValueError, match="n_nationkey.*drifted"):
        load_table(spark, drift, "nation")


def test_missing_column_fails_loudly(spark, sf_dir, tmp_path):
    drift = _write_variant(spark, sf_dir, tmp_path, "nation", ["n_nationkey", "n_name"])
    with pytest.raises(ValueError, match="missing declared columns"):
        load_table(spark, drift, "nation")


def test_memo_relation_reuses_then_invalidates_on_rewrite(spark, sf_dir, tmp_path):
    """memo_relation must (a) call build() once per (key, sf_dir, table
    fingerprint) and return the same handle, and (b) MISS after the source
    table is rewritten in place — a stale memoized keep-list silently
    feeding q110/q175 after an ingest would be the exact bug the
    fingerprint law exists to prevent (the load_table/_EMB_COUNT_CACHE
    precedent)."""
    import shutil
    import time as _time

    from flink_adcom_spark.tables import memo_relation

    work = str(tmp_path / "sfmemo")
    os.makedirs(work, exist_ok=True)
    src = os.path.join(sf_dir, "documents.parquet")
    dst = os.path.join(work, "documents.parquet")
    shutil.copyfile(src, dst)

    calls = []

    def build():
        calls.append(1)
        return load_table(spark, work, "documents").select("doc_id")

    a = memo_relation(spark, work, "t_memo", build)
    b = memo_relation(spark, work, "t_memo", build)
    assert a is b and len(calls) == 1
    n0 = a.count()
    # in-place rewrite: new mtime/size -> new fingerprint -> rebuild
    _time.sleep(0.01)
    spark.read.parquet(src).limit(10).write.mode("overwrite").parquet(dst + ".tmp")
    shutil.rmtree(dst) if os.path.isdir(dst) else os.remove(dst)
    os.rename(dst + ".tmp", dst)
    c = memo_relation(spark, work, "t_memo", build)
    assert len(calls) == 2 and c is not a
    assert c.count() == 10 and n0 != 10
