"""MQTT sink (reference K1 — MqttDataSink.java:15-112): the publish path must
run executor-side (foreachPartition), one message per record, at-least-once.
No broker/client exists in this environment, so a fake client is injected;
the import gate itself is tested separately."""

from __future__ import annotations

import inspect
import os
import uuid

import pytest

from flink_adcom_spark.sources import mqtt as mqtt_mod
from flink_adcom_spark.sources.mqtt import mqtt_sink_writer
from flink_adcom_spark.tables import load_table


def test_mqtt_sink_publishes_executor_side(spark, sf_dir, tmp_path):
    out_dir = str(tmp_path / "published")
    os.makedirs(out_dir)

    # defined inside the test so cloudpickle ships it by VALUE to the
    # executor workers (a module-level test class would be imported by name,
    # which workers cannot resolve)
    class FileClient:
        """Fake paho-surface client: records publishes, flushes them to a
        unique file on disconnect (executors share the local FS here)."""

        def __init__(self, out_dir: str):
            self.out_dir = out_dir
            self.connected = None
            self.lines: list[str] = []

        def connect(self, host: str, port: int) -> None:
            self.connected = (host, port)

        def publish(self, topic: str, payload: str) -> None:
            assert self.connected is not None, "publish before connect"
            self.lines.append(f"{topic}\t{payload}")

        def disconnect(self) -> None:
            path = os.path.join(self.out_dir, f"{os.getpid()}_{uuid.uuid4().hex}")
            with open(path, "w") as f:
                f.write("\n".join(self.lines) + ("\n" if self.lines else ""))

    def factory(out_dir=out_dir):
        return FileClient(out_dir)

    writer = mqtt_sink_writer(topic="t-data", client_factory=factory)
    df = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type")
        .repartition(4)
    )
    writer(df, epoch_id=0)

    published: list[str] = []
    files = os.listdir(out_dir)
    for name in files:
        with open(os.path.join(out_dir, name)) as f:
            published += [ln for ln in f.read().splitlines() if ln]

    expected = [f"t-data\t{r['event_id']}|{r['event_type']}" for r in df.collect()]
    assert sorted(published) == sorted(expected)
    # one client (= one flush file) per non-empty partition, not one global
    # driver-side connection
    assert len(files) > 1


def test_mqtt_sink_path_has_no_driver_roundtrip():
    """The K1 contract a user copies must not serialize records through the
    driver: no toLocalIterator/collect anywhere in the sink module."""
    src = inspect.getsource(mqtt_mod)
    assert "toLocalIterator" not in src
    assert ".collect()" not in src


def test_mqtt_sink_gated_without_client():
    with pytest.raises(NotImplementedError, match="paho-mqtt"):
        mqtt_sink_writer()


def _broker_reachable(host: str, port: int, timeout_s: float = 0.5) -> bool:
    import socket

    try:
        with socket.create_connection((host, port), timeout=timeout_s):
            return True
    except OSError:
        return False


@pytest.mark.mqtt
def test_mqtt_wire_roundtrip_against_live_broker(spark, sf_dir):
    """Full wire-path integration: publish a small batch through the real
    paho client to a live broker and read it back from a subscription.
    Skipped unless paho-mqtt is importable AND a broker answers on
    127.0.0.1:1883 (run `pytest -m mqtt` where mosquitto exists) — the day
    the environment grows a broker, the executor-side publish path stops
    being dead code without any edits here."""
    mqtt = pytest.importorskip("paho.mqtt.client")
    host, port = mqtt_mod.DEFAULT_HOST, mqtt_mod.DEFAULT_PORT
    if not _broker_reachable(host, port):
        pytest.skip(f"no MQTT broker reachable at {host}:{port}")

    import threading

    topic = f"t-it-{uuid.uuid4().hex[:8]}"
    received: list[str] = []
    done = threading.Event()

    sub = (
        mqtt.Client(mqtt.CallbackAPIVersion.VERSION2)
        if hasattr(mqtt, "CallbackAPIVersion")
        else mqtt.Client()
    )
    sub.connect(host, port)
    sub.subscribe(topic)

    def on_message(_client, _userdata, msg, *_props):
        received.append(msg.payload.decode())
        if len(received) >= 5:
            done.set()

    sub.on_message = on_message
    sub.loop_start()
    try:
        writer = mqtt_sink_writer(topic=topic, host=host, port=port)
        df = (
            load_table(spark, sf_dir, "events")
            .select("event_id", "event_type")
            .limit(5)
            .repartition(2)
        )
        writer(df, epoch_id=0)
        assert done.wait(timeout=10), f"only {len(received)}/5 messages arrived"
        expected = [f"{r['event_id']}|{r['event_type']}" for r in df.collect()]
        assert sorted(received[:5]) == sorted(expected)
    finally:
        sub.loop_stop()
        sub.disconnect()


def test_mqtt_sink_unacked_publish_fails_the_task(spark, sf_dir):
    """QoS-1 at-least-once is only real if a LOST PUBACK fails the task:
    paho's wait_for_publish(timeout) returns silently on timeout, so the
    sink must check is_published() afterwards and raise. A fake client
    whose message-info never acknowledges must make the batch fail (Spark
    surfaces the executor-side RuntimeError as a PythonException)."""
    class NeverAckedInfo:
        def wait_for_publish(self, timeout=None):
            return None  # paho behavior on timeout: silent return

        def is_published(self):
            return False

    class SilentlyDroppingClient:
        def connect(self, host, port):
            pass

        def publish(self, topic, payload, qos=0):
            return NeverAckedInfo()

        def disconnect(self):
            pass

    writer = mqtt_sink_writer(topic="t-ack", client_factory=SilentlyDroppingClient)
    df = load_table(spark, sf_dir, "events").select("event_id").limit(3)
    with pytest.raises(Exception) as exc_info:
        writer(df, epoch_id=0)
    assert "not acknowledged" in str(exc_info.value)
