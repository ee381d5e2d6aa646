"""Round-5 quiet-window re-bench of the four sub-second queries whose r4
medians regressed +25-34% vs r3 (ann_brute_topk, langid_metrics,
dedup_exact, dedup_minhash_fast) — VERDICT r4 asked for an attribution:
noise or a named cause.

Protocol: one session, one warmup per query, then N_PASSES interleaved
ROUNDS (a round runs each query once, in order) so slow host windows hit
all queries equally rather than biasing whichever query was mid-run.
Reports min / median / spread per query, alongside the r3/r4 medians,
and writes BENCH/NOISE_R5.md.

Run: PYTHONPATH=/root/repo python scripts/rebench_noise.py
"""

from __future__ import annotations

import json
import time

from wordscape_spark import queries as Q
from wordscape_spark.operators import dedup as D
from wordscape_spark.session import build_session

SF_DIR = "/root/testdata/sf0.1"
N_PASSES = 7


def median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def main():
    spark = build_session(app_name="rebench", master="local[32]",
                          shuffle_partitions=32,
                          extra_conf={"spark.sql.files.minPartitionNum": "256"})

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    jobs = {
        "dedup_exact": lambda: noop(Q.QUERIES["dedup_exact"](spark, SF_DIR)),
        "dedup_minhash_fast": lambda: noop(
            D.minhash_duplicate_pairs(
                spark.read.parquet(f"{SF_DIR}/documents.parquet").selectExpr(
                    "CAST(doc_id AS STRING) AS doc_id", "text"),
                fast=True)),
        "langid_metrics": lambda: noop(
            Q.QUERIES["text_metrics"](spark, SF_DIR).join(
                Q.QUERIES["langid"](spark, SF_DIR), "doc_id")),
        "ann_brute_topk": lambda: noop(
            Q.QUERIES["ann_brute_topk"](spark, SF_DIR)),
    }
    # r3 / r4 medians from BENCH_r03.json / BENCH_r04.json
    prior = {
        "dedup_exact": (0.33, 0.41),
        "dedup_minhash_fast": (0.52, 0.70),
        "langid_metrics": (0.95, 1.24),
        "ann_brute_topk": (1.23, 1.56),
    }

    for fn in jobs.values():  # warmup round (excluded)
        fn()

    walls = {k: [] for k in jobs}
    for _ in range(N_PASSES):
        for name, fn in jobs.items():
            t0 = time.monotonic()
            fn()
            walls[name].append(round(time.monotonic() - t0, 3))
    spark.stop()

    lines = [
        "# Round-5 re-bench of the r4-regressed sub-second queries",
        "",
        f"{N_PASSES} interleaved rounds after a warmup round, local[32],",
        "sf0.1, noop sink (same protocol as bench.py, more passes).",
        "",
        "| query | r3 med | r4 med | r5 min | r5 med | r5 spread (max/min) |",
        "|---|---|---|---|---|---|",
    ]
    verdicts = []
    for name, xs in walls.items():
        r3m, r4m = prior[name]
        med, mn, mx = median(xs), min(xs), max(xs)
        lines.append(
            f"| {name} | {r3m:.2f} | {r4m:.2f} | {mn:.2f} | {med:.2f} |"
            f" {mx / mn:.2f}x |")
        verdicts.append((name, r3m, r4m, med, mx / mn))
    lines.append("")
    for name, r3m, r4m, med, spread in verdicts:
        if med <= r3m * 1.10:
            call = (f"r5 median {med:.2f}s is back at/below the r3 level -> "
                    "the r4 +{:.0f}% was HOST NOISE".format((r4m / r3m - 1) * 100))
        elif med <= r4m * 0.9:
            call = (f"r5 median {med:.2f}s sits between r3 and r4 -> partial "
                    "noise; residual delta needs a cause if it persists in r6")
        else:
            call = (f"r5 median {med:.2f}s matches r4 -> REAL regression, "
                    "needs a named cause")
        lines.append(f"- **{name}**: {call} (pass spread {spread:.2f}x)")
    lines.append("")
    lines.append("Raw passes: " + json.dumps(walls))
    lines.append("")
    out = "\n".join(lines)
    with open("BENCH/NOISE_R5.md", "w") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    main()
