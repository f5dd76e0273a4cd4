"""Batch/stream parity: the streaming windowed rollup over the finite
events input must equal the batch q13 rollup (same grouping keys and
aggregates), per the Structured Streaming model."""

from __future__ import annotations

from data_pipeline_and_visualization_dashboard_spark import streaming
from data_pipeline_and_visualization_dashboard_spark.queries import (
    q13_windowed_counts,
)
from tests.conftest import SF_SMOKE


def test_stream_matches_batch(spark):
    stream_out = streaming.run_to_completion(spark, SF_SMOKE)
    batch_out = q13_windowed_counts(spark, SF_SMOKE)
    s = {
        (r.window_start, r.event_type): (r.event_cnt, r.value_sum)
        for r in stream_out.collect()
    }
    b = {
        (r.window_start, r.event_type): (r.event_cnt, r.value_sum)
        for r in batch_out.collect()
    }
    assert s == b
    assert len(s) > 0


def test_streaming_dedup_across_batches(spark, tmp_path):
    """Duplicated event_ids split across two micro-batches must be
    dropped by the stateful dedup (state survives batch boundaries)."""
    from data_pipeline_and_visualization_dashboard_spark.io import read_table

    events = read_table(spark, SF_SMOKE, "events")
    raw = spark.read.parquet(SF_SMOKE + "/events.parquet")  # ts as long
    in_dir = str(tmp_path / "stream_in")
    # file A: ids [0, 600); file B: ids [300, 1000) -> 300 dups
    raw.filter("event_id < 600").coalesce(1).write.parquet(
        in_dir, mode="append"
    )
    raw.filter("event_id >= 300").coalesce(1).write.parquet(
        in_dir, mode="append"
    )
    out = streaming.run_dedup_to_completion(spark, in_dir)
    assert out.count() == events.count()  # every id exactly once
    assert out.select("event_id").distinct().count() == events.count()
