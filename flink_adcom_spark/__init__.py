"""flink_adcom_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of felipegutierrez/flink-adcom (a Flink fork whose
contribution is AdCom, an adaptive pre-shuffle combiner for keyed streaming
aggregations).

This is NOT a port of the reference's Java/Flink internals. The reference's query
surface (keyed count / count-distinct / avg / max / sum / top-N over taxi-ride and
TPC-H lineitem streams, TPC-H Q1/Q6, word count, tumbling windows — see SURVEY.md
§2.3) is re-expressed as DataFrame / Spark-SQL logical plans that Catalyst compiles
to partial-aggregate + shuffle + final-aggregate physical plans; Catalyst's built-in
`HashAggregate(partial)` plays the role of the reference's hand-built combine
operator (reference: flink-streaming-java/.../DataStream.java:1403-1436). The one
genuinely novel reference component — the adaptive flush-interval controller
(flink-runtime/.../PreAggregateControllerService.java:25-402) — is rebuilt in
`streaming/controller.py` as a StreamingQueryListener-driven band controller over
micro-batch trigger intervals.

Layout:
    session.py    SparkSession factory tuned for the local[32] test harness
    tables.py     schemas + loaders for the synthetic TPC-H-ish test tables
    registry.py   central query registry: name -> (spark builder, duckdb oracle)
    queries/      the reference's query set + extensions, each with an oracle
    operators/    combine/adCombine parity layer, top-N, dedup, similarity
    functions/    scalar column-expression libraries (distance, geo grid, text)
    streaming/    structured-streaming jobs + the adaptive trigger controller
    sources/      rate-limited replay sources for streaming tests
    plans/        plan-inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
