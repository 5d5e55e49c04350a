"""External connector surface, gated for this environment.

Spark's own connector API covers what a reference user would plug in (Kafka
instead of MQTT, JDBC dims, lakehouse tables). The v1 image ships none of the
extra jars, so each builder probes availability and raises a single clear
NotImplementedError naming the missing piece instead of a deep Py4J stack.
The call signatures are the real ones — swap the jar in and they work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ConnectorUnavailable(NotImplementedError):
    pass


def _gate(spark: SparkSession, source: str, probe_class: str):
    jvm = spark._jvm
    try:
        jvm.java.lang.Class.forName(probe_class)
    except Exception as e:
        raise ConnectorUnavailable(
            f"{source} connector jar not on the classpath in this environment "
            f"(needs {probe_class}); add the package via spark.jars.packages"
        ) from e


def kafka_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str, starting_offsets: str = "latest"
) -> DataFrame:
    """Kafka source — the production stand-in for the reference's MQTT data
    topic (payload in `value`, ingestion time in `timestamp`)."""
    _gate(spark, "kafka", "org.apache.spark.sql.kafka010.KafkaSourceProvider")
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def jdbc_table(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """JDBC dimension-table reader (driver jar required)."""
    driver = options.get("driver")
    if driver:
        _gate(spark, "jdbc", driver)
    else:
        # no explicit driver option: ask DriverManager whether ANY registered
        # driver accepts the url, so the no-jar case still fails with ONE
        # clear ConnectorUnavailable instead of a deep Py4J SQLException
        # from reader.load()
        try:
            spark._jvm.java.sql.DriverManager.getDriver(url)
        except Exception as e:  # noqa: BLE001
            raise ConnectorUnavailable(
                f"no JDBC driver on the classpath accepts url {url!r} — add "
                "the driver jar via spark.jars/spark.jars.packages (e.g. "
                "org.postgresql:postgresql) or pass driver=<class> explicitly"
            ) from e
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def delta_table(spark: SparkSession, path: str) -> DataFrame:
    """Delta Lake reader (delta-spark jars required)."""
    _gate(spark, "delta", "org.apache.spark.sql.delta.catalog.DeltaCatalog")
    return spark.read.format("delta").load(path)
