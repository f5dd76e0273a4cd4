"""Derived columns (SURVEY §2.4 P1-P9) on the events table.

Reference derivations (assignment1.ipynb:186-202 cell c844bfd3 /
app.py:34-51): duration minutes, hour, day-of-week name, guarded-division
speed, dict label map. Mapped onto events:

  event_hour       : P3  hour(ts)
  event_dow        : P4  date_format(ts,'EEEE')  ('Monday'...)
  value_per_k      : P5  guarded division value / props.k (0.0 when k=0,
                     NOT null — reference's speed zero-guard, ipynb:195-198)
  event_type_label : P6  dict value-map via chained when() (app.py:120-127);
                     unmapped codes -> null label, faithfully replicating
                     the reference's silent-drop trap (SURVEY §7.4 #4)
  props_k          : JSON payload extraction (regexp-based so the DuckDB
                     oracle can mirror it exactly)
  dow_num          : O4 helper — ISO weekday number for the reference's
                     CASE-expression weekday sort (ipynb:376-386)

All built-in expressions — zero Python UDFs, full codegen (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# P6 labels: reference maps payment codes {1..4,0} -> names (app.py:120-127).
EVENT_TYPE_LABELS: dict[str, str] = {
    "click": "Click",
    "view": "View",
    "purchase": "Purchase",
    "signup": "Sign Up",
    "error": "Error",
}

WEEKDAYS = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
            "Saturday", "Sunday"]


def label_map_expr(col: str, mapping: dict[str, str]) -> Column:
    """P6 as a when()-chain: stays in codegen, no UDF. Unmapped -> null
    (reference behavior)."""
    expr = None
    for k, v in mapping.items():
        cond = F.col(col) == k
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    return expr


def weekday_num_expr(dow_col: Column) -> Column:
    """O4: Monday=1..Sunday=7 via array_position — the tidy Spark spelling
    of the reference's CASE WHEN ladder (ipynb:376-386)."""
    return F.array_position(F.array(*[F.lit(d) for d in WEEKDAYS]), dow_col)


def derive_event_columns(df: DataFrame) -> DataFrame:
    """P1: batched withColumns, second batch depends on the first —
    mirrors the reference's two chained with_columns (ipynb:186-199)."""
    first = df.withColumns(
        {
            "event_hour": F.hour("ts").cast("int"),
            "event_dow": F.date_format("ts", "EEEE"),
            # nullif guards the no-match '' (ANSI cast of '' throws)
            "props_k": F.nullif(
                F.regexp_extract("props", r'"k":\s*(\d+)', 1), F.lit("")
            ).cast("int"),
            "event_type_label": label_map_expr("event_type", EVENT_TYPE_LABELS),
        }
    )
    # dependent second batch (P5 guarded division + O4 weekday number)
    return first.withColumns(
        {
            "value_per_k": F.when(
                F.col("props_k") > 0, F.col("value") / F.col("props_k")
            ).otherwise(F.lit(0.0)),
            "dow_num": weekday_num_expr(F.col("event_dow")).cast("int"),
        }
    )
