

def test_q176_pit_features_never_leak_the_label(spark, sf_dir):
    """Leakage proof for the point-in-time feature snapshot: the k-th
    purchase of every user must see EXACTLY k-1 prior purchases and the
    exact sum of the first k-1 purchase values — the label event itself
    (and anything after it) can never appear in its own features."""
    from decimal import Decimal

    from flink_adcom_spark.registry import get
    from flink_adcom_spark.tables import load_table

    rows = get("q176_pit_training_features").build(spark, sf_dir).collect()
    purchases = (
        load_table(spark, sf_dir, "events")
        .filter("event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL")
        .select("event_id", "user_id", "ts", "value")
        .collect()
    )
    by_user: dict = {}
    for r in purchases:
        by_user.setdefault(r["user_id"], []).append(r)
    for u in by_user:
        by_user[u].sort(key=lambda r: (r["ts"], r["event_id"]))

    got = {r["label_event_id"]: r for r in rows}
    assert len(got) == len(purchases)
    checked_nonzero = 0
    for u, evs in by_user.items():
        run = Decimal(0)
        for k, ev in enumerate(evs):
            g = got[ev["event_id"]]
            assert g["prior_purchases"] == k, (u, k)
            assert abs(g["prior_purchase_value"] - float(run)) < 1e-9, (u, k)
            if ev["value"] is not None:
                run += Decimal(str(round(ev["value"], 6)))
            if k > 0:
                checked_nonzero += 1
    assert checked_nonzero > 0  # the non-trivial (k >= 1) branch really ran
