#!/usr/bin/env python3
"""Solo min-of-N probe of the two streaming throughput benches (uniform and
skew30 word count), written for the r7 watchlist item: the driver bench
recorded skew30 at 9.4M rows/s vs r6's 15.9M while the uniform stream ROSE —
either a short-sample artifact (bench.py takes max(processedRowsPerSecond)
over one 12 s window) or a real hot-key-path regression. This probe runs each
variant N times back-to-back on an otherwise idle machine and prints all
samples, so the two hypotheses separate: a noisy sampler shows high spread
with healthy maxima; a regression shows a consistently depressed skew ceiling.

Run: python tools/stream_probe.py [n_runs]  (default 3; ~90 s for 3+3)
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from bench import _stream_throughput
    from flink_adcom_spark.session import get_spark

    spark = get_spark("stream-probe", cpus=int(os.environ["SPARK_GRAFT_CPUS"]))
    # one throwaway run to absorb codegen/JIT for this plan shape
    _stream_throughput(spark, run_s=6.0)
    # INTERLEAVED samples: session-lifetime effects (JIT warmth, GC pressure,
    # accumulated memory-sink tables) otherwise bias whichever variant runs
    # first — the first probe version ran uniform x3 then skew x3 and read a
    # 0.69 skew ratio that was partly ordering, not the hot key.
    out: dict[str, list[int]] = {"uniform": [], "skew30": []}
    for _ in range(n):
        out["uniform"].append(_stream_throughput(spark)["rows_per_sec"])
        out["skew30"].append(_stream_throughput(spark, skewed=True)["rows_per_sec"])
    summary = {
        k: {"samples": v, "min": min(v), "max": max(v)} for k, v in out.items()
    }
    # a fully saturated box can record no completed batch (all zeros); emit
    # the samples instead of dying on the ratio
    umax = summary["uniform"]["max"]
    summary["skew_over_uniform_best"] = (
        round(summary["skew30"]["max"] / umax, 3) if umax else None
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
