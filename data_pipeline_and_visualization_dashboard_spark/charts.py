"""Dashboard chart-data contracts (SURVEY §2.13) + parameterized filter.

The reference dashboard (assignment1_dashboard/app.py) renders six
plotly charts, each consuming a tiny pre-aggregated frame produced from
the sidebar-filtered dataset (app.py:142-148). Rendering is out of
scope; the engine owns the small-frame producers:

  metrics tiles   (A6)            app.py:109-115
  top-10 groups   (A7+O1+J3+O5)   app.py:150-193
  avg by hour     (A2+O2)         app.py:202-236
  histogram       (F10+A9)        app.py:246-275
  type donut      (A7+P6)         app.py:283-315
  day×hour heatmap(A3+O4)         app.py:323-373

The parameterized filter replicates the sidebar semantics exactly,
including two documented traps (SURVEY §7.4 #3/#4): the date upper
bound is MIDNIGHT of the end day (later rows excluded), and unmapped
type codes get a null label which an IN-filter silently drops.

Every producer output is ≤ a few hundred rows: at 100 TB the heavy
side is the scan+partial-agg, which Spark distributes; the frames
handed to pandas/plotly stay tiny by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .derive import EVENT_TYPE_LABELS, derive_event_columns, weekday_num_expr
from .io import read_table

HIST_LO, HIST_HI, HIST_BIN = 0.0, 500.0, 10.0


def filtered_events(
    df: DataFrame,
    date_range: tuple[str, str] | None = None,
    hour_range: tuple[int, int] | None = None,
    type_labels: list[str] | None = None,
) -> DataFrame:
    """F7+F8+F9 sidebar filter (app.py:142-148).

    date_range upper bound is cast to midnight (the reference's
    `date_hi` trap — rows later that day are excluded, replicated
    deliberately). type_labels filters on the DERIVED label; null
    labels (unmapped codes) never match an IN list.
    """
    df = derive_event_columns(df)
    if date_range is not None:
        lo, hi = date_range
        df = df.filter(
            (F.col("ts") >= F.lit(lo).cast("timestamp"))
            & (F.col("ts") <= F.lit(hi).cast("timestamp"))
        )
    if hour_range is not None:
        df = df.filter(F.col("event_hour").between(*hour_range))
    if type_labels is not None:
        df = df.filter(F.col("event_type_label").isin(*type_labels))
    return df


# --- six producers (each returns the §2.13 contract frame) --------------

def metrics_summary(df: DataFrame) -> DataFrame:
    """A6 metric tiles: one row, single-pass multi-aggregate."""
    return df.agg(
        F.count(F.lit(1)).alias("total_events"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


def top_users(df: DataFrame, k: int = 10) -> DataFrame:
    """A7+O1 top-k: TakeOrderedAndProject, deterministic tie-break."""
    return (
        df.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("event_cnt"))
        .orderBy(F.desc("event_cnt"), F.asc("user_id"))
        .limit(k)
    )


def avg_value_by_hour(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("event_hour")
        .agg(F.round(F.avg("value"), 6).alias("avg_value"))
        .orderBy("event_hour")
    )


def value_histogram(df: DataFrame) -> DataFrame:
    """F10+A9: fixed-width binning owned by the engine (the reference
    delegates to plotly's nbins; A9 notes it is a data op). Bin =
    floor(value/width) over the clipped range."""
    return (
        df.filter((F.col("value") > HIST_LO) & (F.col("value") < HIST_HI))
        .groupBy(
            F.floor(F.col("value") / F.lit(HIST_BIN)).cast("int").alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bin")
    )


def type_donut(df: DataFrame) -> DataFrame:
    """A7+P6: counts by mapped label; unmapped -> null label kept as a
    row (the donut shows it as blank), matching value_counts(dropna=False)
    is NOT what pandas does — the reference's value_counts drops null,
    so we drop it too."""
    return (
        df.filter(F.col("event_type_label").isNotNull())
        .groupBy("event_type_label")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("event_type_label"))
    )


def day_hour_heatmap(df: DataFrame) -> DataFrame:
    """A3+O4: long-form (dow, hour, count), weekday-ordered — the pivot
    to a 7×24 grid stays display-side, like the reference's pandas
    unstack."""
    return (
        df.groupBy("event_dow", "event_hour")
        .agg(F.count(F.lit(1)).alias("event_cnt"))
        .orderBy(weekday_num_expr(F.col("event_dow")), F.col("event_hour"))
    )


# --- fixed-parameter variants wired into the driver's oracle harness ----

_DATE_LO, _DATE_HI = "2024-01-05", "2024-01-20"
_HOUR_LO, _HOUR_HI = 6, 18
_LABELS = ["Click", "Purchase", "Sign Up"]

# Shared SQL fragments so the oracle filter is char-for-char the same
# semantics as filtered_events().
_LABEL_CASE = "CASE event_type " + " ".join(
    f"WHEN '{k}' THEN '{v}'" for k, v in EVENT_TYPE_LABELS.items()
) + " END"
_FILTER_SQL = (
    f"ts >= TIMESTAMP '{_DATE_LO} 00:00:00' "
    f"AND ts <= TIMESTAMP '{_DATE_HI} 00:00:00' "
    f"AND hour(ts) BETWEEN {_HOUR_LO} AND {_HOUR_HI} "
    f"AND {_LABEL_CASE} IN ({', '.join(repr(l) for l in _LABELS)})"
)


def _filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return filtered_events(
        read_table(spark, sf_dir, "events"),
        date_range=(_DATE_LO, _DATE_HI),
        hour_range=(_HOUR_LO, _HOUR_HI),
        type_labels=_LABELS,
    )


def q7_filtered_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return metrics_summary(_filtered(spark, sf_dir))


def q8_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_users(_filtered(spark, sf_dir))


def q9_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_histogram(_filtered(spark, sf_dir))


def q10_type_donut(spark: SparkSession, sf_dir: str) -> DataFrame:
    return type_donut(_filtered(spark, sf_dir))


def q11_day_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return day_hour_heatmap(_filtered(spark, sf_dir))


def q12_derived_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P6 projection surface: every derived column over raw events
    (unfiltered), hashed row-by-row against the oracle."""
    df = derive_event_columns(read_table(spark, sf_dir, "events"))
    return df.select(
        "event_id",
        "event_hour",
        "event_dow",
        "props_k",
        "event_type_label",
        # deliberately NOT rounded: row-level IEEE ops on identical
        # inputs give bit-identical doubles in Spark and DuckDB, while
        # round() implementations disagree on near-halfway values
        "value_per_k",
        "dow_num",
    )


ORACLE_SQL: dict[str, str] = {
    "q7_filtered_metrics": f"""
        SELECT count(*) AS total_events,
               round(avg(value), 6) AS avg_value,
               round(sum(value), 4) AS total_value,
               count(DISTINCT user_id) AS n_users,
               min(ts) AS min_ts, max(ts) AS max_ts
        FROM events WHERE {_FILTER_SQL}
    """,
    "q8_top_users": f"""
        SELECT user_id, count(*) AS event_cnt
        FROM events WHERE {_FILTER_SQL}
        GROUP BY user_id ORDER BY event_cnt DESC, user_id LIMIT 10
    """,
    "q9_value_histogram": f"""
        SELECT CAST(floor(value / {HIST_BIN}) AS INT) AS bin,
               count(*) AS cnt
        FROM events
        WHERE {_FILTER_SQL} AND value > {HIST_LO} AND value < {HIST_HI}
        GROUP BY 1 ORDER BY 1
    """,
    "q10_type_donut": f"""
        SELECT {_LABEL_CASE} AS event_type_label, count(*) AS cnt
        FROM events WHERE {_FILTER_SQL}
        GROUP BY 1 HAVING event_type_label IS NOT NULL
        ORDER BY cnt DESC, event_type_label
    """,
    "q11_day_hour_heatmap": f"""
        SELECT dayname(ts) AS event_dow, CAST(hour(ts) AS INT) AS event_hour,
               count(*) AS event_cnt
        FROM events WHERE {_FILTER_SQL}
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q12_derived_events": f"""
        SELECT event_id,
               CAST(hour(ts) AS INT) AS event_hour,
               dayname(ts) AS event_dow,
               CAST(nullif(regexp_extract(props, '"k":\\s*(\\d+)', 1), '')
                    AS INT) AS props_k,
               {_LABEL_CASE} AS event_type_label,
               CASE WHEN CAST(nullif(regexp_extract(props,
                         '"k":\\s*(\\d+)', 1), '') AS INT) > 0
                    THEN value / CAST(nullif(regexp_extract(props,
                         '"k":\\s*(\\d+)', 1), '') AS INT)
                    ELSE 0.0 END AS value_per_k,
               CAST(CASE dayname(ts)
                    WHEN 'Monday' THEN 1 WHEN 'Tuesday' THEN 2
                    WHEN 'Wednesday' THEN 3 WHEN 'Thursday' THEN 4
                    WHEN 'Friday' THEN 5 WHEN 'Saturday' THEN 6
                    WHEN 'Sunday' THEN 7 END AS INT) AS dow_num
        FROM events
    """,
}

QUERIES = {
    "q7_filtered_metrics": q7_filtered_metrics,
    "q8_top_users": q8_top_users,
    "q9_value_histogram": q9_value_histogram,
    "q10_type_donut": q10_type_donut,
    "q11_day_hour_heatmap": q11_day_hour_heatmap,
    "q12_derived_events": q12_derived_events,
}
