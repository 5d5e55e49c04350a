"""Connected components by iterative min-label propagation.

The clustering step a dedup pipeline needs between "near-dup PAIRS" (LSH /
simhash joins, queries/dedup.py) and "keep one doc per CLUSTER": treat the
pairs as edges and find components; cluster_id = the component's smallest
vertex id (deterministic canonical representative).

Spark-first iterative shape (no graph library):
    labels <- vertex id
    repeat: every vertex takes min(own label, neighbors' labels)
    until no label changes                         [O(component diameter)]

Each iteration is one shuffle join + one aggregate. Two things make the loop
scale-correct:
- `localCheckpoint` per iteration truncates the lineage — without it the
  plan doubles each round and planning cost explodes (the classic iterative-
  algorithm failure mode in Spark).
- convergence is detected with a changed-label count (an aggregate, not a
  collect of the labels).

Label propagation converges in diameter rounds, and near-dup clusters have
small diameters; the safety cap turns a pathological chain into an explicit
error rather than silent wrong labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Return (v, cluster_id) for every vertex appearing in `edges`;
    cluster_id is the min vertex id of the component. Raises if the label
    propagation has not converged within max_iter rounds."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    labels = (
        sym.select(F.col("a").alias("v")).distinct().withColumn("lbl", F.col("v"))
    ).localCheckpoint(eager=False)

    # labels only ever DECREASE (least of self and neighbors), so the label
    # sum strictly decreases until the fixpoint — an O(1)-row aggregate
    # detects convergence without joining new labels against old ones.
    prev_sum = None
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.b == labels.v)
            .groupBy("a")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        labels = (
            labels.join(nbr_min, labels.v == nbr_min.a, "left")
            .select(
                "v",
                F.least(F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("lbl")).collect()[0][0]
        if cur_sum == prev_sum:
            return labels.select("v", F.col("lbl").alias("cluster_id"))
        prev_sum = cur_sum
    raise RuntimeError(f"label propagation did not converge in {max_iter} rounds")
