#!/usr/bin/env python
"""Scan-pruning evidence for the extract salt-threshold split.

The interleaved table maintains an ``n_spans`` column (the Iceberg
size-metadata analog).  This script snapshots, for the mega-doc branch
(``n_spans > salt_threshold``):

* the formatted physical plan showing the predicate in PushedFilters,
* the parquet row-group stats (how many groups can contain a mega-doc at
  all — everything else is skipped by min/max),
* measured scan wall: maintained-column filter vs the ``size(spans)``
  fallback that must decode the whole spans column.

Writes BENCH/PRUNING.md.  Run: python scripts/pruning_evidence.py
(env: SPARK_GRAFT_SCALING_SF_DIR, default /root/testdata/sf0.8 — mega docs
only exist at the larger scale factors).
"""

from __future__ import annotations

import io
import os
import pathlib
import sys
import time
from contextlib import redirect_stdout

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from wordscape_spark import datagen  # noqa: E402
from wordscape_spark.config import DEFAULT_CONFIG  # noqa: E402
from wordscape_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SCALING_SF_DIR", "/root/testdata/sf0.8"
    )
    path = datagen.ensure_interleaved(datagen.sf_from_dir(sf_dir))
    thr = DEFAULT_CONFIG.salt_threshold

    # parquet row-group min/max stats for the maintained column
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    # physical leaf index (nested spans fans out into several leaf columns)
    col_idx = next(
        i
        for i in range(pf.metadata.row_group(0).num_columns)
        if pf.metadata.row_group(0).column(i).path_in_schema == "n_spans"
    )
    n_groups = pf.metadata.num_row_groups
    hot_groups = sum(
        1
        for g in range(n_groups)
        if pf.metadata.row_group(g).column(col_idx).statistics.max > thr
    )

    spark = build_session(
        app_name="pruning-evidence",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]",
    )
    docs = spark.read.parquet(path)

    big_maintained = docs.filter(f"n_spans > {thr}").select("doc_id")
    big_fallback = docs.filter(f"size(spans) > {thr}").select("doc_id")

    buf = io.StringIO()
    with redirect_stdout(buf):
        big_maintained.explain("formatted")
    plan = buf.getvalue()

    def timed(df):
        df.count()  # warmup (page cache)
        walls = []
        for _ in range(3):
            t0 = time.monotonic()
            n = df.count()
            walls.append(time.monotonic() - t0)
        return round(min(walls), 3), n

    t_maint, n_big = timed(big_maintained)
    t_fall, n_big2 = timed(big_fallback)
    assert n_big == n_big2, (n_big, n_big2)
    spark.stop()

    pushed = [
        line.strip() for line in plan.splitlines()
        if "PushedFilters" in line or "ReadSchema" in line
    ]
    out = REPO / "BENCH" / "PRUNING.md"
    out.write_text(
        f"""# BENCH/PRUNING — maintained n_spans column prunes the mega-doc scan

`extract` splits its input at ``n_spans > {thr}`` (salt threshold).  With
the maintained ``n_spans`` column (the Iceberg size-metadata analog), the
predicate pushes to the parquet scan and is answered from row-group
min/max statistics; the ``size(spans)`` fallback must decode the entire
spans column a second time.

Input: {path} ({pf.metadata.num_rows} docs, {n_groups} row groups of 256
rows).

**Row-group stats:** only **{hot_groups} / {n_groups}** row groups have
``max(n_spans) > {thr}`` — every other group is skipped without touching
data pages.  The mega-doc branch matches {n_big} documents.

**Pushed predicate (from `.explain("formatted")` of the branch):**

```
{chr(10).join(pushed)}
```

**Measured branch scan (count of mega-doc ids, min of 3 passes,
local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]):**

| predicate | wall (s) |
|---|---|
| maintained ``n_spans > {thr}`` (pushed, stats-pruned) | {t_maint} |
| fallback ``size(spans) > {thr}`` (decodes spans column) | {t_fall} |

{round(t_fall / max(t_maint, 1e-9), 1)}× — this is the "second scan is
(nearly) free" property the Iceberg design promised (VERDICT r2 §missing
2): at 100 TB the equivalent is partition/file-level pruning on the size
metadata column, same plan shape.
"""
    )
    print(out)
    print(
        {"hot_groups": hot_groups, "n_groups": n_groups,
         "t_maintained_s": t_maint, "t_fallback_s": t_fall, "n_big": n_big}
    )


if __name__ == "__main__":
    main()
