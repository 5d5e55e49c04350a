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


def mqtt_sink_writer(
    topic: str = DATA_TOPIC,
    host: str = DEFAULT_HOST,
    port: int = DEFAULT_PORT,
    client_factory=None,
):
    """foreachBatch function publishing each row's string form (the K1
    contract: one message per record, at-least-once — MqttDataSink.java:
    15-112). At-least-once is real: QoS 1 with wait_for_publish inside the
    partition, so an unacknowledged message fails the task (and the batch
    replays) instead of being silently dropped at QoS 0.

    Publishing happens EXECUTOR-SIDE via foreachPartition — one client
    connection per partition, rows never routed through the driver. (A sink
    that iterates the batch on the driver serializes every record through
    one process; at 1000 executors that is the whole job's bottleneck.)

    `client_factory` is a picklable zero-arg callable returning an object
    with connect/publish/disconnect (paho's surface); tests inject a fake,
    production omits it for a real paho client. Raises NotImplementedError
    without paho-mqtt when no factory is given."""
    if client_factory is None:
        mqtt = _paho()

        def client_factory():
            # paho-mqtt >= 2.0 requires the callback API version as the
            # first argument (bare Client() raises ValueError there);
            # 1.x has no CallbackAPIVersion attribute
            if hasattr(mqtt, "CallbackAPIVersion"):
                return mqtt.Client(mqtt.CallbackAPIVersion.VERSION2)
            return mqtt.Client()

    def publish(batch_df: DataFrame, epoch_id: int) -> None:
        def publish_partition(rows) -> None:
            client = client_factory()
            client.connect(host, port)
            # at-least-once needs a network loop (paho queues outbound
            # packets; without loop_start nothing is flushed until
            # disconnect's implicit teardown, and broker rejections are
            # silent) plus QoS 1 + wait_for_publish so a lost PUBACK keeps
            # the batch from committing. Fakes without these surfaces
            # degrade gracefully (hasattr guards).
            if hasattr(client, "loop_start"):
                client.loop_start()
            try:
                infos = []
                for row in rows:
                    payload = "|".join(str(v) for v in row)
                    try:
                        info = client.publish(topic, payload, qos=1)
                    except TypeError:  # fake client without a qos parameter
                        info = client.publish(topic, payload)
                    if hasattr(info, "wait_for_publish"):
                        infos.append(info)
                for info in infos:
                    # wait_for_publish(timeout) returns SILENTLY on timeout
                    # (it only raises if the message was never queued), so a
                    # lost PUBACK must be detected explicitly: an unpublished
                    # message fails the task, the batch replays, and
                    # at-least-once actually holds.
                    info.wait_for_publish(timeout=30)
                    if hasattr(info, "is_published") and not info.is_published():
                        raise RuntimeError(
                            f"MQTT publish to {topic!r} not acknowledged "
                            "within 30s (QoS-1 PUBACK missing); failing the "
                            "task so the batch replays"
                        )
            finally:
                if hasattr(client, "loop_stop"):
                    client.loop_stop()
                client.disconnect()

        batch_df.foreachPartition(publish_partition)

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
