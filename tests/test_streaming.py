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
