#!/usr/bin/env python3
"""Synthesize an sf1-scale corpus (10x sf0.1) for the scaling probe's
quadratic-family rows — documents + embeddings only, the two tables the
cluster-scoped quadratics (q156/q112), CC closure (q45), vocabulary-bound
encode (q168/q179), and salted folds (q149/q153) read.

/root/testdata is read-only, so the tables land in SF1_DIR (/tmp); the
generation is fully deterministic (seeded numpy), so the SCALING.md rows it
backs are reproducible by re-running this script + tools/scaling_probe.py.

Shape preservation, replica r in 1..9 of each sf0.1 row:
  documents: word order rotated by r (same vocabulary, same length
    distribution, same lang/source mix; rotation keeps the corpus
    duplicate-heavy — most shingles survive — which is the documented
    regime of the probe corpus).
  embeddings: v + N(0, 0.02) seeded per replica, re-normalized (cluster
    structure preserved so k-means/SemDeDup behave; at N = 20,000 the
    derived k leaves its floor — k = ceil(sqrt(20000/64)) = 18 — which is
    exactly the flattening the sf1 rows exist to demonstrate).
"""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF1_DIR = "/tmp/spark_graft_sf1"
SRC = "/root/testdata/sf0.1"
REPLICAS = 10  # originals count as replica 0


def main() -> None:
    os.makedirs(SF1_DIR, exist_ok=True)

    docs = pq.read_table(f"{SRC}/documents.parquet")
    n = docs.num_rows
    doc_id = docs.column("doc_id").to_pylist()
    text = docs.column("text").to_pylist()
    lang = docs.column("lang").to_pylist()
    source = docs.column("source").to_pylist()
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for r in range(REPLICAS):
        for i in range(n):
            if r == 0:
                t = text[i]
            else:
                w = text[i].split(" ")
                k = r % max(1, len(w))
                t = " ".join(w[k:] + w[:k])
            out["doc_id"].append(doc_id[i] + r * n)
            out["text"].append(t)
            out["lang"].append(lang[i])
            out["source"].append(source[i])
            out["n_chars"].append(len(t))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "text": pa.array(out["text"], pa.string()),
                "lang": pa.array(out["lang"], pa.string()),
                "source": pa.array(out["source"], pa.string()),
                "n_chars": pa.array(out["n_chars"], pa.int64()),
            }
        ),
        f"{SF1_DIR}/documents.parquet",
    )

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    m = emb.num_rows
    vec_id = np.asarray(emb.column("vec_id").to_numpy())
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.asarray(emb.column("label").to_numpy())
    rng = np.random.default_rng(20260815)
    all_ids, all_vecs, all_labels = [], [], []
    for r in range(REPLICAS):
        if r == 0:
            v = vecs
        else:
            v = vecs + rng.normal(0, 0.02, vecs.shape).astype(np.float32)
            v = v / np.linalg.norm(v, axis=1, keepdims=True) * np.linalg.norm(
                vecs, axis=1, keepdims=True
            )
        all_ids.append(vec_id + r * m)
        all_vecs.append(v.astype(np.float32))
        all_labels.append(labels)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.concatenate(all_ids), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, row)) for row in np.concatenate(all_vecs)],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(np.concatenate(all_labels), pa.int32()),
            }
        ),
        f"{SF1_DIR}/embeddings.parquet",
    )
    print(f"wrote {SF1_DIR}: documents={n * REPLICAS}, embeddings={m * REPLICAS}")


if __name__ == "__main__":
    main()
