"""Snapshot exact query results for equivalence checking across an
optimization refactor.

Usage: python scripts/snapshot_results.py <out.json> <sf_dir> q1 q2 ...

Collects each query fully, canonicalizes rows (sorted by their string
form — order-insensitive, same convention as the driver's value-hash),
and writes {query: sha256} to <out.json>.  Run once at the old code,
once at the new; identical hashes == identical results, bit for bit
(floats go through repr, which round-trips doubles exactly).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from data_pipeline_and_visualization_dashboard_spark.session import (  # noqa: E402
    get_spark,
)


def canon(v):
    """Canonical JSON-safe form of one cell (ADVICE r16 #3): floats
    via repr (exact double round-trip), Row/struct values via asDict
    (Row is a tuple subclass, so it must be tested BEFORE generic
    containers or its fields bypass canonicalization), temporal and
    Decimal cells via isoformat/str so json.dumps never raises."""
    import datetime
    import decimal

    from pyspark.sql import Row

    if isinstance(v, float):
        return repr(v)
    if isinstance(v, Row):
        return {k: canon(x) for k, x in sorted(v.asDict().items())}
    if isinstance(v, (list, tuple)):
        return [canon(x) for x in v]
    if isinstance(v, dict):
        return {k: canon(x) for k, x in sorted(v.items())}
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return v


def main() -> None:
    out_path, sf_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    spark = get_spark(app_name="snapshot_results")
    registry = entrymod.queries()
    hashes: dict[str, str] = {}
    for name in names:
        df = registry[name](spark, sf_dir)
        rows = [
            json.dumps([canon(v) for v in r], sort_keys=True)
            for r in (tuple(row) for row in df.collect())
        ]
        rows.sort()
        h = hashlib.sha256("\n".join(rows).encode()).hexdigest()
        hashes[name] = f"{h}:{len(rows)}"
        print(f"# {name}: {len(rows)} rows {h[:16]}", flush=True)
    with open(out_path, "w") as f:
        json.dump(hashes, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
