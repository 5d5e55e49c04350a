from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_adcom_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("flink_adcom_spark_tests", cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_SMALL}/{name}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def planted_embeddings_dir(tmp_path_factory):
    """Fixture dir whose embeddings table carries PLANTED near-duplicates:
    for every vec_id % 25 == 3 a sign-preserving perturbed copy (each even
    component scaled 1.2x) is appended under vec_id + 500000, plus one decoy
    vector (seeded gaussian) under 900000 that is near NOTHING. Construction
    asserts the planted cosines land in [0.92, 0.9999] and the decoy's max
    cosine against the whole corpus stays below 0.85, so the q53/q88
    detection threshold has real positives AND real negatives to separate —
    the synthetic corpus alone has no cosine >= 0.9 pair at any SF, which
    left the near-dup path vacuously green (VERDICT r7)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF_SMALL}/embeddings.parquet")
    ids = src.column("vec_id").to_numpy()
    vecs = np.array(src.column("embedding").to_pylist(), dtype=np.float32)
    labels = src.column("label").to_numpy()

    sel = ids % 25 == 3
    base = vecs[sel].astype(np.float64)
    scale = np.where(np.arange(vecs.shape[1]) % 2 == 0, 1.2, 1.0)
    pert = (base * scale).astype(np.float32)
    cos = np.sum(base * pert, axis=1) / (
        np.linalg.norm(base, axis=1) * np.linalg.norm(pert.astype(np.float64), axis=1)
    )
    assert (cos >= 0.92).all() and (cos <= 0.9999).all(), cos

    rng = np.random.default_rng(20260815)
    decoy = rng.standard_normal(vecs.shape[1]).astype(np.float32)
    allv = np.vstack([vecs, pert]).astype(np.float64)
    d64 = decoy.astype(np.float64)
    dcos = (allv @ d64) / (np.linalg.norm(allv, axis=1) * np.linalg.norm(d64))
    assert np.abs(dcos).max() < 0.85, np.abs(dcos).max()

    new_ids = np.concatenate([ids, ids[sel] + 500_000, [900_000]])
    new_vecs = np.vstack([vecs, pert, decoy[None, :]])
    new_labels = np.concatenate([labels, labels[sel], [0]]).astype(labels.dtype)
    out = pa.table(
        {
            "vec_id": pa.array(new_ids, type=pa.int64()),
            "embedding": pa.array(list(new_vecs), type=pa.list_(pa.float32())),
            "label": pa.array(new_labels, type=src.schema.field("label").type),
        }
    )
    dst = tmp_path_factory.mktemp("planted_emb")
    pq.write_table(out, f"{dst}/embeddings.parquet")
    for t in (
        "region nation customer supplier part orders lineitem events documents".split()
    ):
        os.symlink(f"{SF_SMALL}/{t}.parquet", f"{dst}/{t}.parquet")
    expected_pairs = {(int(i), int(i) + 500_000) for i in ids[sel]}
    return str(dst), expected_pairs


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "mqtt: integration tests that need a live MQTT broker (pytest -m mqtt)",
    )
