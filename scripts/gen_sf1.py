"""Generate a synthetic sf1 dataset by deterministic 10x expansion of
/root/testdata/sf0.1 — the measured 10x scale point for the bench
appendix (BENCH_sf1_appendix.json). Not driver data: the driver only
ships sf{0.001,0.01,0.1}, so the 10x claim in the scale argument is
otherwise plan-read, never measured.

Expansion rules (copy i in 0..9):
  fact tables   — replicate with key offsets (key + i * 10**9 for copy
                  i>0) so every FK relationship survives: customer /
                  supplier / part / orders / lineitem / events keys all
                  shift by the SAME offset, so joins land within a copy.
  dim tables    — region/nation stay as-is (TPC-H dims are fixed-size
                  at every SF; nationkey references remain 0..24).
  documents     — doc_id offset; copy i>0 ROTATES each doc's tokens by
                  i positions. Rotation keeps token/shingle VOLUME
                  identical while making cross-copy Jaccard ~0, so the
                  dedup workload (exact groups, LSH buckets, near-dup
                  pairs) grows linearly with the data — replicating
                  text verbatim would instead grow pair counts
                  quadratically inside 10x-sized dup groups, a
                  different (superlinear) workload, not a scale-up.
  embeddings    — vec_id offset, vectors verbatim (ANN corpus 10x; the
                  5 query vectors stay the originals).

Usage: python scripts/gen_sf1.py [out_dir]   (default /tmp/sgraft_sf1)
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from data_pipeline_and_visualization_dashboard_spark.session import (  # noqa: E402
    get_spark,
)

SRC = "/root/testdata/sf0.1"
# $SPARK_GRAFT_SF_COPIES overrides the expansion factor (e.g. 30 for
# an sf3 point on the scale ladder)
COPIES = int(__import__("os").environ.get("SPARK_GRAFT_SF_COPIES", "10"))
OFF = 10**9  # key offset unit: far above any sf0.1 key


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sgraft_sf1"
    spark = get_spark(app_name="gen_sf1")
    copies = spark.range(COPIES).select(F.col("id").alias("_copy"))

    def expand(table: str, key_cols: list[str], n_parts: int = 8):
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        wide = df.crossJoin(F.broadcast(copies))
        for k in key_cols:
            wide = wide.withColumn(k, F.col(k) + F.col("_copy") * OFF)
        return wide.drop("_copy").repartition(n_parts)

    def write(df, table: str) -> None:
        df.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        print(f"wrote {table}", flush=True)

    # dims: verbatim
    for t in ("region", "nation"):
        write(spark.read.parquet(f"{SRC}/{t}.parquet"), t)

    write(expand("customer", ["c_custkey"], 4), "customer")
    write(expand("supplier", ["s_suppkey"], 2), "supplier")
    write(expand("part", ["p_partkey"], 4), "part")
    write(expand("orders", ["o_orderkey", "o_custkey"], 8), "orders")
    write(
        expand("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"], 16),
        "lineitem",
    )
    write(expand("events", ["event_id", "user_id"], 8), "events")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    write(
        emb.crossJoin(F.broadcast(copies))
        .withColumn("vec_id", F.col("vec_id") + F.col("_copy") * OFF)
        .drop("_copy")
        .repartition(8),
        "embeddings",
    )

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    toks = F.split(F.col("text"), r"\s+")
    n = F.size(toks)
    rot = F.least(F.col("_copy").cast("int"), n - 1)
    rotated = F.concat(
        F.slice(toks, rot + 1, n - rot), F.slice(toks, F.lit(1), rot)
    )
    write(
        docs.crossJoin(F.broadcast(copies))
        .withColumn("doc_id", F.col("doc_id") + F.col("_copy") * OFF)
        .withColumn(
            "text",
            F.when(F.col("_copy") == 0, F.col("text")).otherwise(
                F.array_join(rotated, " ")
            ),
        )
        .withColumn("n_chars", F.length("text"))
        .drop("_copy")
        .repartition(8),
        "documents",
    )
    print(f"done: {out}", flush=True)


if __name__ == "__main__":
    main()
