"""End-to-end pipeline test: ingest -> validate -> clean -> derive ->
persist (partitioned) -> read back -> analyze, with the accounting
invariant and SQL-view registration checked."""

from __future__ import annotations

import pytest

from data_pipeline_and_visualization_dashboard_spark.pipeline import (
    run_events_pipeline,
)
from data_pipeline_and_visualization_dashboard_spark.validate import (
    SchemaValidationError, validate_schema,
)
from data_pipeline_and_visualization_dashboard_spark.schemas import EVENTS
from tests.conftest import SF_SMOKE


def test_pipeline_end_to_end(spark, tmp_path):
    out = str(tmp_path / "clean_events")
    res = run_events_pipeline(spark, SF_SMOKE, out_path=out)

    r = res.removal_report
    removed = sum(v for k, v in r.items() if k.startswith("removed_"))
    assert r["rows_in"] == r["rows_kept"] + removed

    # persisted data reads back with derived columns and full row count
    assert res.cleaned.count() == r["rows_kept"]
    for c in ["event_hour", "event_dow", "value_per_k", "event_date"]:
        assert c in res.cleaned.columns

    # partition pruning: a date filter must read a subset of partitions
    one_day = res.cleaned.filter("event_date = '2024-01-02'")
    assert 0 < one_day.count() < r["rows_kept"]

    # SQL view registered
    n = spark.sql("SELECT count(*) AS n FROM events_clean").first().n
    assert n == r["rows_kept"]


def test_observed_accounting_matches_standalone(spark):
    """clean_events_observed must report the same V5 metrics as the
    standalone removal_accounting scan — but collected DURING the job
    that materializes the cleaned frame (zero extra passes), with the
    CollectMetrics node sitting between scan and keep-filter so the
    metrics see rejected rows."""
    from data_pipeline_and_visualization_dashboard_spark.clean import (
        clean_events_observed, clean_events_with_report,
    )
    from data_pipeline_and_visualization_dashboard_spark.io import read_table

    events = read_table(spark, SF_SMOKE, "events")
    cleaned_obs, obs = clean_events_observed(events)
    # metrics must NOT lose rejected rows to filter pushdown
    plan = cleaned_obs._jdf.queryExecution().executedPlan().toString()
    assert "CollectMetrics" in plan
    cleaned_obs.write.mode("overwrite").format("noop").save()
    got = dict(obs.get)
    cleaned_ref, report_df = clean_events_with_report(events)
    want = report_df.first().asDict()
    assert got == want
    assert got["rows_kept"] == cleaned_ref.count()


def test_split_quarantine_consistent_with_accounting(spark):
    """good/bad split must reconcile with clean_events and the
    accounting report, and reasons must match the removal attribution."""
    from data_pipeline_and_visualization_dashboard_spark.clean import (
        clean_events, clean_events_with_report, split_events,
    )
    from data_pipeline_and_visualization_dashboard_spark.io import read_table

    events = read_table(spark, SF_SMOKE, "events")
    good, bad = split_events(events)
    cleaned, report = clean_events_with_report(events)
    r = report.first().asDict()
    assert good.count() == r["rows_kept"] == cleaned.count()
    assert bad.count() == r["rows_in"] - r["rows_kept"]
    from pyspark.sql import functions as F

    by_reason = {
        row.reject_reason: row.n
        for row in bad.groupBy("reject_reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for reason, n in by_reason.items():
        assert r[f"removed_{reason}"] == n


def test_accounting_attributes_null_rows(spark):
    """First-failing-rule attribution: a row with null value lands in
    removed_nulls (rule order), not value_pos."""
    from pyspark.sql import functions as F

    from data_pipeline_and_visualization_dashboard_spark.clean import (
        cleaning_rules, split_events,
    )
    from data_pipeline_and_visualization_dashboard_spark.io import read_table
    from data_pipeline_and_visualization_dashboard_spark.validate import (
        removal_accounting,
    )

    events = read_table(spark, SF_SMOKE, "events")
    dirty = events.union(
        events.limit(2).withColumn("value", F.lit(None).cast("double"))
    )
    r = removal_accounting(dirty, cleaning_rules()).first().asDict()
    assert r["removed_nulls"] == 2
    assert r["removed_value_pos"] == 0
    good, bad = split_events(dirty)
    reasons = [x.reject_reason for x in bad.collect()]
    assert reasons == ["nulls", "nulls"]


def test_validate_schema_raises_on_missing(spark):
    from data_pipeline_and_visualization_dashboard_spark.io import read_table

    df = read_table(spark, SF_SMOKE, "events").drop("value")
    with pytest.raises(SchemaValidationError):
        validate_schema(df, EVENTS)


def test_validate_schema_raises_on_dtype(spark):
    from data_pipeline_and_visualization_dashboard_spark.io import read_table

    from pyspark.sql import functions as F

    df = read_table(spark, SF_SMOKE, "events").withColumn(
        "ts", F.lit(0).cast("long")
    )
    with pytest.raises(SchemaValidationError):
        validate_schema(df, EVENTS, timestamp_columns=["ts"])


def test_run_corpus_pipeline_writes_all_artifacts(spark, tmp_path):
    """The corpus runner must leave a complete, consistent artifact
    set: curated corpus = funnel survivors exactly; packs conserve the
    curated chunks; every survivor gets one split; the tokenizer
    carries all N_MERGES merges; the index covers the curated vocab;
    the contamination report covers every training doc x benchmark."""
    from data_pipeline_and_visualization_dashboard_spark.extras.bpe import (
        N_MERGES,
    )
    from data_pipeline_and_visualization_dashboard_spark.extras.dedup import (
        CONTAM_EVAL_MODS,
    )
    from data_pipeline_and_visualization_dashboard_spark.pipeline import (
        run_corpus_pipeline,
    )
    from tests.conftest import SF_SMOKE

    out = str(tmp_path / "artifacts")
    res = run_corpus_pipeline(spark, SF_SMOKE, out)
    assert res.funnel["docs_in"] == (
        res.funnel["removed_quality"]
        + res.funnel["removed_exact"]
        + res.funnel["removed_neardup"]
        + res.funnel["docs_out"]
    )
    curated = spark.read.parquet(f"{out}/curated/documents.parquet")
    assert curated.count() == res.n_survivors > 0
    splits = spark.read.parquet(f"{out}/splits.parquet")
    assert splits.count() == res.n_survivors
    packs = spark.read.parquet(f"{out}/packs.parquet")
    assert res.n_packs == packs.count() > 0
    merges = spark.read.parquet(f"{out}/tokenizer_merges.parquet")
    assert merges.count() == res.n_merges == N_MERGES
    idx = spark.read.parquet(f"{out}/index.parquet")
    assert idx.count() > 0
    contam = spark.read.parquet(f"{out}/contamination.parquet")
    n_train_docs = contam.select("doc_id").distinct().count()
    assert contam.count() == n_train_docs * len(CONTAM_EVAL_MODS)
    # scrub-at-ingest: the curated text is the redacted clean_text —
    # no PII pattern may survive in any curated doc — and the report
    # artifact accounts every survivor exactly once
    from pyspark.sql import functions as F

    from data_pipeline_and_visualization_dashboard_spark.extras.text import (
        PII_RULES,
    )

    for name, pat in PII_RULES:
        leaked = curated.filter(
            F.regexp_count("text", F.lit(pat)) > 0
        ).count()
        assert leaked == 0, f"curated corpus leaks {name}"
    pii = spark.read.parquet(f"{out}/pii_report.parquet").first()
    assert pii.docs_scrubbed == res.n_survivors
    assert all(pii[f"n_{name}"] >= 0 for name, _ in PII_RULES)
