from __future__ import annotations

import os

import pytest

from data_pipeline_and_visualization_dashboard_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="include the slow tier (tests/slow_tests.txt) — the "
        "builder's full per-round gate; the default fast tier is what "
        "the driver's fixed window runs (VERDICT r16 ask #1)",
    )


def _slow_ids() -> set[str]:
    path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    try:
        with open(path) as f:
            return {
                ln.strip()
                for ln in f
                if ln.strip() and not ln.startswith("#")
            }
    except OSError:
        return set()


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (VERDICT r16 ask #1): the 558-test suite's
    26-36 min outran the driver's test window (VERIFY_r16
    tests_ok:false with zero failures — a timeout, not a failure).
    The manifest in tests/slow_tests.txt (every test ≥4.0 s call time
    on a full --durations=0 run, ~1130 s of 1580 s) is SKIPPED by
    default so the driver's `pytest tests/ -x -q` finishes in ~9 min
    with a visible `N passed, M skipped` summary; `--runslow` or
    SPARK_GRAFT_FULL_TESTS=1 runs everything (the builder's gate —
    coverage is deferred to the full tier, never deleted)."""
    run_all = (
        config.getoption("--runslow")
        or os.environ.get("SPARK_GRAFT_FULL_TESTS") == "1"
    )
    slow = _slow_ids()
    skip = pytest.mark.skip(
        reason="slow tier (run with --runslow or SPARK_GRAFT_FULL_TESTS=1)"
    )
    for item in items:
        if item.nodeid in slow:
            item.add_marker(pytest.mark.slow)
            if not run_all:
                item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_CORRECT}/{name}.parquet')"
        )
    yield con
    con.close()
