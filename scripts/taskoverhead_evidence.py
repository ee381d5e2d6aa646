#!/usr/bin/env python
"""Evidence for OPTIMIZATION_r07.md §11: per-task Python-worker overhead.

Measures a trivial 256-task identity mapInArrow stage (and its JVM-only
twin) twice — once with the stock pyspark daemon, once with
``wordscape_spark.fastdaemon`` (the zip-invalidation mtime guard) — and
prints one JSON line.  The stock run shows ~0.2 s of pure per-task CPU
burn (Python 3.11 re-parses every sys.path zip's central directory on the
per-task ``importlib.invalidate_caches()`` call); the fastdaemon run shows
the same stage at the Python-boundary floor.

Run: ``python scripts/taskoverhead_evidence.py`` (from the repo root).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _ident(batches):
    for b in batches:
        yield b


def measure(daemon_module: str | None) -> dict:
    from wordscape_spark.session import build_session

    extra = {}
    if daemon_module:
        extra["spark.python.daemon.module"] = daemon_module
    spark = build_session(
        app_name=f"taskoverhead-{daemon_module or 'default'}",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf=extra,
    )
    out = {}
    for nparts in (32, 256):
        df = spark.range(0, 100_000, 1, nparts)
        m = df.mapInArrow(_ident, schema="id long")

        def noop(d):
            d.write.format("noop").mode("overwrite").save()

        noop(df)
        jvm = []
        for _ in range(3):
            t0 = time.monotonic()
            noop(df)
            jvm.append(round(time.monotonic() - t0, 3))
        noop(m)
        py = []
        for _ in range(4):
            t0 = time.monotonic()
            noop(m)
            py.append(round(time.monotonic() - t0, 3))
        out[f"parts_{nparts}"] = {"jvm_min_s": min(jvm), "python_min_s": min(py)}
    spark.stop()
    return out


if __name__ == "__main__":
    stock = measure("pyspark.daemon")
    fast = measure("wordscape_spark.fastdaemon")
    print(
        json.dumps(
            {
                "metric": "python_task_overhead_identity_stage",
                "stock_daemon": stock,
                "fastdaemon": fast,
            }
        )
    )
