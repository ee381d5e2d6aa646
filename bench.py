#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "docs_per_sec": ...}

--scaling mode: runs the extraction job at two parallelism levels (local[8]
and local[32]) on identical input and writes BENCH/BASELINE.md with
throughput at both + scaling efficiency (the sandbox evidence for the
N→4N-executor criterion in BASELINE.json).
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time
from shutil import which as shutil_which

REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _noop_write(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_bench() -> dict:
    from wordscape_spark import datagen
    from wordscape_spark import queries as Q
    from wordscape_spark.operators import extract as X
    from wordscape_spark.session import build_session

    sf = datagen.sf_from_dir(SF_DIR)
    interleaved = datagen.ensure_interleaved(sf)

    spark = build_session(
        app_name="wordscape-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    timings: dict[str, float] = {}

    docs = spark.read.parquet(interleaved)
    n_docs = docs.count()

    # warmup: spawn python workers / JIT codegen before any timed query
    _noop_write(X.extract(docs.limit(512)))

    def timed(name: str, fn):
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 3)

    # headline: full extraction (classified spans + metadata for every doc)
    timed("extract", lambda: _noop_write(X.extract(docs)))

    # quality-gate / auxiliary operators at bench scale
    timed(
        "dedup_minhash",
        lambda: _noop_write(Q.QUERIES["dedup_minhash"](spark, SF_DIR)),
    )
    from wordscape_spark.operators import dedup as D

    timed(
        "dedup_minhash_fast",
        lambda: _noop_write(
            D.minhash_duplicate_pairs(
                spark.read.parquet(f"{SF_DIR}/documents.parquet").selectExpr(
                    "CAST(doc_id AS STRING) AS doc_id", "text"
                ),
                fast=True,
            )
        ),
    )
    timed(
        "dedup_exact",
        lambda: _noop_write(Q.QUERIES["dedup_exact"](spark, SF_DIR)),
    )
    timed(
        "langid_metrics",
        lambda: _noop_write(
            Q.QUERIES["text_metrics"](spark, SF_DIR).join(
                Q.QUERIES["langid"](spark, SF_DIR), "doc_id"
            )
        ),
    )
    timed(
        "ann_brute_topk",
        lambda: _noop_write(Q.QUERIES["ann_brute_topk"](spark, SF_DIR)),
    )
    timed(
        "doc_whitelist",
        lambda: _noop_write(Q.QUERIES["doc_whitelist"](spark, SF_DIR)),
    )
    timed(
        "media_features",
        lambda: _noop_write(Q.QUERIES["media_features"](spark, SF_DIR)),
    )

    spark.stop()
    total = round(sum(timings.values()), 3)
    return {
        "metric": "wordscape_spark end-to-end operator suite",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / timings["extract"], 2),
        "cpus": int(CPUS),
    }


def run_scaling() -> None:
    """Same extraction job at local[8] vs local[32]; writes BENCH/BASELINE.md.

    Each run is pinned to exactly that many CPUs with taskset — otherwise the
    "8-core" JVM/Python workers spill onto the idle 24 cores and the N-run
    throughput is inflated, understating true N→4N scaling.
    """
    # a larger input than the per-round bench: at sf0.1 (20k docs) fixed
    # session/stage costs are ~60% of the 32-core wall and the measurement
    # reflects startup, not scaling; sf0.8 (160k docs) is compute-dominated.
    scaling_sf_dir = os.environ.get("SPARK_GRAFT_SCALING_SF_DIR", "/root/testdata/sf0.8")
    pairs = [
        tuple(int(c) for c in p.split(":"))
        for p in os.environ.get("SPARK_GRAFT_SCALING_PAIRS", "4:16,8:32").split(",")
    ]
    all_cores = sorted({c for p in pairs for c in p})

    trials = int(os.environ.get("SPARK_GRAFT_SCALING_TRIALS", "2"))

    def measure(cores: int) -> dict:
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(cores)
        env["SPARK_GRAFT_SF_DIR"] = scaling_sf_dir
        cmd = [sys.executable, __file__, "--extract-only"]
        if shutil_which("taskset"):
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        best = None
        for _ in range(trials):  # independent JVMs: host noise dominates
            out = subprocess.run(
                cmd, capture_output=True, text=True, env=env, cwd=REPO,
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            if best is None or r["queries"]["extract"] < best["queries"]["extract"]:
                best = r
        return best

    results = {c: measure(c) for c in all_cores}
    n = results[all_cores[0]]["n_docs"]

    rows = []
    effs = {}
    for lo, hi in pairs:
        tl, th = results[lo]["queries"]["extract"], results[hi]["queries"]["extract"]
        thr_l, thr_h = n / tl, n / th
        eff = (thr_h / thr_l) / (hi / lo)
        effs[f"{lo}->{hi}"] = round(eff, 3)
        rows.append(
            f"| local[{lo}] → local[{hi}] | {tl:.2f} → {th:.2f} "
            f"| {thr_l:.1f} → {thr_h:.1f} | **{eff:.3f}** |"
        )
    per_core_rows = "\n".join(
        f"| local[{c}] | {results[c]['queries']['extract']:.2f} "
        f"| {n / results[c]['queries']['extract']:.1f} |"
        for c in all_cores
    )

    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "BASELINE.md").write_text(
        f"""# BENCH/BASELINE — scaling evidence (N vs 4N parallelism)

Same extraction job (`operators.extract.extract` over the deterministic
interleaved table at {scaling_sf_dir.rsplit('/', 1)[-1]}, {n} docs) run at
multiple parallelism levels on identical input, each run pinned with
taskset to exactly that many CPUs — the sandbox proxy for N vs 4N executors
(BASELINE.json north_rule).  Wall time is the steady-state (post-warmup)
run.  The machine has 32 physical cores; the 8→32 pair saturates the whole
box (shared memory bandwidth + JVM service threads + frequency droop), so
the dedicated-cores 4→16 pair is the cleaner analog of adding executors to
a cluster; both are reported.

| parallelism | wall (s) | docs/s |
|---|---|---|
{per_core_rows}

| N → 4N pair | wall | docs/s | scaling efficiency |
|---|---|---|---|
{chr(10).join(rows)}

Target ≥ 0.8 per BASELINE.json.
"""
    )
    print(json.dumps({"n_docs": n, "efficiency": effs}))


def run_extract_only() -> dict:
    from wordscape_spark import datagen
    from wordscape_spark.operators import extract as X
    from wordscape_spark.session import build_session

    sf = datagen.sf_from_dir(SF_DIR)
    interleaved = datagen.ensure_interleaved(sf)
    spark = build_session(
        app_name="wordscape-bench-extract",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    docs = spark.read.parquet(interleaved)
    n_docs = docs.count()
    extracted = X.extract(docs)
    _noop_write(extracted)  # warmup: python workers spawn + code paths JIT
    secs = None
    for _ in range(2):  # best-of-2 steady-state runs (host-noise robustness)
        t0 = time.monotonic()
        _noop_write(extracted)
        secs = min(secs or 1e9, round(time.monotonic() - t0, 3))
    spark.stop()
    return {
        "metric": "extract",
        "value": secs,
        "unit": "sec",
        "queries": {"extract": secs},
        "sf": sf,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / secs, 2),
        "cpus": int(CPUS),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--extract-only" in sys.argv:
        print(json.dumps(run_extract_only()))
    else:
        print(json.dumps(run_bench()))
