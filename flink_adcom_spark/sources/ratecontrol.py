"""Runtime data-rate control — the reference's DataRateListener semantics.

Reference surface (SURVEY.md S9): every source thread polls a control file
(`/tmp/datarate.txt`) once a minute and applies the new inter-record delay to
the RUNNING job — no restart (DataRateListener.java:12-120, consumed by
TaxiRideSource.java:33-163). The whole AdCom experiment depends on this: the
controller must adapt when the input rate changes mid-run, in both
directions.

Spark's built-in `rate` source pins rowsPerSecond at query start, so the
runtime-variable path here is a FILE FEEDER: a driver-side thread appends one
parquet file per tick to a spool directory, sized current_rate * tick rows,
re-reading the rate file each poll period; the consuming
`readStream.parquet(spool)` sees the new rate at its very next micro-batch
with the query left running — the same observable contract as the reference
(rate changes flow through a file, land mid-run, no restart anywhere).

At cluster scale this is not a toy: file-fed replay IS the production
ingestion shape (object-store landing zone + file stream), and the feeder
stands in for whatever upstream producer's throughput varies.
"""

from __future__ import annotations

import os
import threading
import time
from datetime import datetime, timezone

from .replay import CORPORA

WORDS_STREAM_SCHEMA = "ts timestamp, word string"


class DataRateFile:
    """The control-file contract (DataRateListener.java:30-56 reads a long
    from /tmp/datarate.txt; there it is a nanosecond delay, here the
    Spark-native unit rows/second). A missing/garbled read falls back to the
    LAST SUCCESSFULLY READ rate (the reference's fallback-to-current
    behavior — falling back to the constructor default would snap a ramped-
    up experiment back to its starting rate on one torn read), and to
    default_rate only before any successful read."""

    def __init__(self, path: str, default_rate: int = 1000):
        self.path = path
        self.default_rate = int(default_rate)
        self._last = int(default_rate)

    def read_rate(self) -> int:
        try:
            with open(self.path) as f:
                self._last = max(0, int(f.read().strip()))
        except (OSError, ValueError):
            pass  # hold the current rate
        return self._last

    def write_rate(self, rows_per_second: int) -> None:
        tmp = f"{self.path}.tmp"
        with open(tmp, "w") as f:
            f.write(str(int(rows_per_second)))
        os.replace(tmp, self.path)  # atomic: readers never see a torn write


class VariableRateFeeder:
    """Feeds a word stream into `spool_dir` at the rate currently in the
    control file, re-read every `poll_s` (reference default: 60 s).

    Each tick writes ceil(rate * tick_s) rows as ONE parquet file via a
    dot-prefixed temp name + atomic rename — Spark's file source ignores
    dot-files, so a micro-batch never lists a half-written file. Words cycle
    the reference corpus (replay.CORPORA); a monotone sequence number keys
    determinism.
    """

    def __init__(
        self,
        spool_dir: str,
        rate_file: DataRateFile,
        tick_s: float = 0.4,
        poll_s: float | None = None,
        corpus_index: int = 0,
    ):
        os.makedirs(spool_dir, exist_ok=True)
        self.spool_dir = spool_dir
        self.rate_file = rate_file
        self.tick_s = tick_s
        self.poll_s = tick_s if poll_s is None else poll_s
        self.corpus = CORPORA[corpus_index]
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._seq = 0
        self._row = 0
        self.rows_written = 0
        self.error: BaseException | None = None  # set if the feeder died
        self.prune_after_s = 120.0  # delete spool files older than this

    # -- feeder loop ----------------------------------------------------------
    def _write_tick(self, n_rows: int) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        now = datetime.now(timezone.utc).replace(tzinfo=None)
        words = [self.corpus[(self._row + i) % len(self.corpus)] for i in range(n_rows)]
        table = pa.table(
            {
                "ts": pa.array([now] * n_rows, type=pa.timestamp("us")),
                "word": pa.array(words, type=pa.string()),
            }
        )
        tmp = os.path.join(self.spool_dir, f".inprogress-{self._seq:08d}.parquet")
        dst = os.path.join(self.spool_dir, f"tick-{self._seq:08d}.parquet")
        pq.write_table(table, tmp)
        os.replace(tmp, dst)
        self._seq += 1
        self._row += n_rows
        self.rows_written += n_rows
        # bound the spool: one file per tick adds up (~9k/hour at the
        # default tick), and the file source re-lists the directory every
        # micro-batch — prune files old enough that every consumer has long
        # since processed them
        if self._seq % 50 == 0:
            cutoff = time.time() - self.prune_after_s
            for name in os.listdir(self.spool_dir):
                if not name.startswith("tick-"):
                    continue
                path = os.path.join(self.spool_dir, name)
                try:
                    if os.path.getmtime(path) < cutoff:
                        os.remove(path)
                except OSError:
                    pass  # concurrent cleanup; harmless

    def _run(self) -> None:
        try:
            self._run_inner()
        except BaseException as e:  # noqa: BLE001 — surfaced via stop()
            self.error = e
            raise

    def _run_inner(self) -> None:
        last_poll = 0.0
        rate = self.rate_file.read_rate()
        while not self._stop.is_set():
            t0 = time.monotonic()
            if t0 - last_poll >= self.poll_s:
                rate = self.rate_file.read_rate()  # the DataRateListener poll
                last_poll = t0
            n = int(rate * self.tick_s + 0.999)
            if n > 0:
                self._write_tick(n)
            elapsed = time.monotonic() - t0
            self._stop.wait(max(0.0, self.tick_s - elapsed))

    # -- lifecycle ------------------------------------------------------------
    def start(self) -> "VariableRateFeeder":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
        if self.error is not None:
            # a feeder that died mid-run silently starves the stream — the
            # experiment must FAIL, not record a bogus zero-rate phase
            raise RuntimeError(
                f"rate feeder thread died mid-run: {self.error!r}"
            ) from self.error


def variable_words_stream(spark, spool_dir: str, max_files_per_trigger: int | None = None):
    """The consuming side: a word stream whose live rate is governed by the
    feeder's control file (S9's runtime rate swap, Spark face)."""
    reader = spark.readStream.schema(WORDS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(spool_dir)
