"""Cleaning chain (SURVEY §2.3 F1-F6) on the events table.

Reference semantics (assignment1.ipynb:109-165 / app.py:17-52): drop rows
with nulls in the critical subset, then three value filters, then a
timestamp-sanity filter — with per-step removal accounting. Here the whole
chain is ONE lazy plan (Catalyst merges and reorders the conjunction,
pushes it into the parquet scan) and the accounting is the single-pass
aggregate from validate.removal_accounting.

Rule mapping onto the events schema:
  nulls      : F1  — null in any critical column          (ipynb:115)
  value_pos  : F2/F3 — value > 0                          (ipynb:124,128)
  value_cap  : F4  — value <= VALUE_CAP (fare <= 500)     (ipynb:132)
  ts_valid   : F5  — ts within [TS_MIN, now-ish sanity)   (ipynb:141;
               events has one timestamp, so the column-vs-column dropoff
               >= pickup check becomes a range-sanity check; the true
               column-vs-column filter is exercised in queries.q4/q5 via
               l_shipdate >= o_orderdate)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .schemas import EVENTS_CRITICAL
from .validate import removal_accounting

VALUE_CAP = 500.0
TS_MIN = "2000-01-01"
TS_MAX = "2100-01-01"


def cleaning_rules(critical: list[str] | None = None) -> dict[str, Column]:
    """Ordered reason -> KEEP-predicate map (the reference attributes each
    removed row to the first rule that rejects it)."""
    crit = critical or EVENTS_CRITICAL
    not_null = None
    for c in crit:
        cond = F.col(c).isNotNull()
        not_null = cond if not_null is None else (not_null & cond)
    return {
        "nulls": not_null,
        "value_pos": F.col("value") > 0,
        "value_cap": F.col("value") <= VALUE_CAP,
        "ts_valid": (F.col("ts") >= F.lit(TS_MIN).cast("timestamp"))
        & (F.col("ts") < F.lit(TS_MAX).cast("timestamp")),
    }


def clean_events(df: DataFrame) -> DataFrame:
    """F1-F6 as one conjunction — a single filter node Catalyst pushes to
    the scan. Equivalent to the reference's sequential eager filters."""
    rules = cleaning_rules()
    pred = None
    for keep in rules.values():
        pred = keep if pred is None else (pred & keep)
    return df.filter(pred)


def clean_events_with_report(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Returns (cleaned_df, 1-row accounting frame). Two jobs total when
    both are materialized; the accounting never re-scans per rule."""
    return clean_events(df), removal_accounting(df, cleaning_rules())


def clean_events_observed(df: DataFrame) -> tuple[DataFrame, "Observation"]:
    """Cleaning with FREE accounting: the V5 metrics ride whatever job
    first materializes the cleaned frame (df.observe / CollectMetrics),
    so persisting the clean corpus costs ONE pass total — the write —
    instead of write + accounting scan. `Observation.get` blocks until
    that job runs.

    Trade-off, priced deliberately: CollectMetrics is a pushdown
    barrier (Catalyst must not push the keep-filter below the observe
    node — the metrics have to see the REJECTED rows too), so the scan
    reads all rows rather than skipping via pushed filters. That is
    exactly what the accounting semantics require — any implementation
    must observe every input row once — and one full-scan pass beats
    the two passes (pushed scan for the write + full scan for the
    accounting) of the `clean_events_with_report` path whenever the
    frame is materialized anyway. At 100 TB that second saved pass is
    hours. Plan shape (CollectMetrics above the scan, filter above it)
    is pinned in tests/test_plans.py."""
    from pyspark.sql import Observation

    from .validate import accounting_aggs

    rules = cleaning_rules()
    obs = Observation("cleaning_accounting")
    observed = df.observe(obs, *accounting_aggs(rules))
    return clean_events(observed), obs


def split_events(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Quarantine variant: (good, bad_with_reason). The reference
    fail-stops or silently drops (ipynb:109-144); at 100 TB rejected
    rows go to a side table for audit/repair instead. `reject_reason`
    is the FIRST failing rule, matching the accounting's attribution
    order. Both frames derive from one scan plan — Spark evaluates the
    shared predicate per branch; persist upstream if both sides are
    consumed repeatedly."""
    rules = cleaning_rules()
    reason = None
    for name, keep in rules.items():
        failed = ~F.coalesce(keep, F.lit(False))
        reason = (
            F.when(failed, name) if reason is None else reason.when(failed, name)
        )
    tagged = df.withColumn("reject_reason", reason)
    good = tagged.filter(F.col("reject_reason").isNull()).drop("reject_reason")
    bad = tagged.filter(F.col("reject_reason").isNotNull())
    return good, bad
