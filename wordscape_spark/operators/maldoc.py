"""Malicious-document gate (B3 analog).

Reference: oletools OleID indicators with a fatal set {appname, codepage,
encrypted, ext_rels, ObjectPool, vba, xlm, flash} above INFO risk
(/root/reference/app/src/data_sources/maldoc_check.py:13-29, 56-120).

No oletools in the sandbox; the operator keeps the exact shape — an
Arrow-batched scan of the binary column emitting a boolean indicator struct
plus a reject decision — with deterministic byte-pattern indicators standing
in for OleID.  Swapping the pattern table for oletools calls changes only
``_INDICATORS``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
)

# indicator name -> byte pattern (deterministic OleID surrogate)
_INDICATORS = {
    "vba": b"\x56\x42\x41",        # 'VBA'
    "encrypted": b"\x45\x4e\x43",  # 'ENC'
    "ext_rels": b"\x52\x45\x4c",   # 'REL'
    "flash": b"\x46\x57\x53",      # 'FWS' (swf magic)
}
FATAL = frozenset(_INDICATORS)

MALDOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        *[StructField(f"ind_{k}", BooleanType()) for k in sorted(_INDICATORS)],
        StructField("malicious", BooleanType()),
    ]
)


def maldoc_check(media: DataFrame) -> DataFrame:
    """(doc_id, media_ref, ind_*, malicious) over a binary ``content`` col."""

    def scan(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch_iter:
            rows = []
            for doc_id, ref, content in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["content"]
            ):
                b = bytes(content)
                inds = {
                    f"ind_{k}": pat in b for k, pat in _INDICATORS.items()
                }
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media_ref": ref,
                        **{k: inds[k] for k in sorted(inds)},
                        "malicious": any(
                            inds[f"ind_{k}"] for k in FATAL
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(scan, schema=MALDOC_SCHEMA)


def reject_malicious(media: DataFrame) -> DataFrame:
    """The gate: keep only clean media (join back on the verdict)."""
    verdicts = maldoc_check(media).select("doc_id", "media_ref", "malicious")
    return (
        media.join(verdicts, ["doc_id", "media_ref"])
        .filter(~verdicts["malicious"])
        .drop("malicious")
    )
