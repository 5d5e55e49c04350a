"""MQTT source/sink (reference S5/K1) — pluggable stub.

The reference streams data and control messages over a mosquitto broker
(udfs/MqttDataSource.java:8-73, udfs/MqttDataSink.java:15-112; broker topics
in BASELINE.md). MQTT is not part of Spark core and this container ships no
MQTT client or broker, so the connector is gated behind an import-try: with
paho-mqtt installed, mqtt_sink_writer returns a foreachBatch publisher;
without it, a clear NotImplementedError explains the substitute (the socket
source, which IS in Spark core, covers the "text lines over a TCP endpoint"
role in tests).

The controller does NOT need MQTT at all here: the reference used the broker
to move signals between TaskManagers and the JobManager; in Spark both ends
live in the driver process (StreamingQueryListener -> controller), see
streaming/controller.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_HOST = "127.0.0.1"
DEFAULT_PORT = 1883  # BASELINE.md: mosquitto, port 1883
DATA_TOPIC = "topic-data-sink"  # CommonParameters.java:19,37
SHUTDOWN_SENTINEL = "SHUTDOWN"  # MqttDataSource.java stop sentinel


def _paho():
    try:
        import paho.mqtt.client as mqtt  # noqa: F401

        return mqtt
    except ImportError as e:
        raise NotImplementedError(
            "MQTT connector requires paho-mqtt (not installed in this "
            "environment). Use socket_lines_source for a TCP text stream, or "
            "writeStream.foreachBatch with your own publisher."
        ) from e


def mqtt_sink_writer(topic: str = DATA_TOPIC, host: str = DEFAULT_HOST, port: int = DEFAULT_PORT):
    """foreachBatch function publishing each row's string form (the K1
    contract: one message per record, at-least-once — MqttDataSink.java:
    15-112). Raises NotImplementedError without paho-mqtt."""
    mqtt = _paho()

    def publish(batch_df: DataFrame, epoch_id: int) -> None:
        client = mqtt.Client()
        client.connect(host, port)
        try:
            for row in batch_df.toLocalIterator():
                client.publish(topic, "|".join(str(v) for v in row))
        finally:
            client.disconnect()

    return publish


def socket_lines_source(spark: SparkSession, host: str = DEFAULT_HOST, port: int = 9999) -> DataFrame:
    """Spark-core substitute for the MQTT string source (S5): a line-oriented
    TCP text stream with ingestion timestamps."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .option("includeTimestamp", "true")
        .load()
    )
