#!/usr/bin/env python3
"""Synthesize an sf1-scale corpus (10x sf0.1) for the scaling probe's
quadratic-family rows — documents + embeddings (the tables the
cluster-scoped quadratics (q156/q112), CC closure (q45), vocabulary-bound
encode (q168/q179), and salted folds (q149/q153) read) plus events (the
SCD2/temporal family's q237/q238 dimension-growth rows).

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
    ev = pq.read_table(f"{SRC}/events.parquet")
    e = ev.num_rows
    eid = np.asarray(ev.column("event_id").to_numpy())
    uid = np.asarray(ev.column("user_id").to_numpy())
    u_span = int(uid.max()) + 1
    ecols = {c: ev.column(c) for c in ("ts", "event_type", "value", "props")}
    out_eid, out_uid = [], []
    for r in range(REPLICAS):
        # replica r shifts event_id AND user_id into fresh ranges: per-user
        # version-chain SHAPE is preserved while the user population scales
        # 10x — exactly the dimension-growth regime the SCD2 merge's
        # O(batch + open versions) claim (q237, events.py) is about
        out_eid.append(eid + r * (int(eid.max()) + 1))
        out_uid.append(uid + r * u_span)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.concatenate(out_eid), pa.int64()),
                "ts": pa.concat_arrays(
                    [ecols["ts"].combine_chunks()] * REPLICAS
                ),
                "user_id": pa.array(np.concatenate(out_uid), pa.int64()),
                "event_type": pa.concat_arrays(
                    [ecols["event_type"].combine_chunks()] * REPLICAS
                ),
                "value": pa.concat_arrays(
                    [ecols["value"].combine_chunks()] * REPLICAS
                ),
                "props": pa.concat_arrays(
                    [ecols["props"].combine_chunks()] * REPLICAS
                ),
            }
        ),
        f"{SF1_DIR}/events.parquet",
    )
    print(
        f"wrote {SF1_DIR}: documents={n * REPLICAS}, "
        f"embeddings={m * REPLICAS}, events={e * REPLICAS}"
    )


if __name__ == "__main__":
    main()
