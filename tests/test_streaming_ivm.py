"""Streaming incremental view maintenance: signed deltas arriving as
a file stream maintain a SUM/COUNT aggregate view via foreachBatch +
operators/ivm.agg_view_refresh, and the final view equals a batch
recompute over the surviving multiset — the batch/stream equivalence
contract the CDC upsert already has, extended to Z-set aggregates."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from bio_lakehouse_spark.operators.ivm import agg_view_delta, agg_view_refresh


def test_stream_deltas_maintain_agg_view(spark, tmp_path):
    src = tmp_path / "deltas"
    src.mkdir()
    sink = tmp_path / "view"

    batches = [
        [(1, 10.0, 1), (1, 20.0, 1), (2, 5.0, 1)],
        [(2, 7.0, 1), (3, 1.0, 1), (1, 10.0, -1)],   # update grp 1, new grp 3
        [(3, 1.0, -1), (2, 2.0, 1)],                  # empty grp 3
    ]
    # seed an empty materialized view
    empty = spark.createDataFrame([], "k int, x double, __w int")
    agg_view_delta(empty, ["k"], ["x"]).write.mode("overwrite").parquet(
        str(sink)
    )

    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "k int, x double, __w int").coalesce(
            1
        ).write.mode("overwrite").json(str(src / f"b{i}"))

    schema = "k int, x double, __w int"
    stream = spark.readStream.schema(schema).json(str(src / "b*"))

    def refresh(batch_df, batch_id):
        view = batch_df.sparkSession.read.parquet(str(sink))
        new_view = agg_view_refresh(view, batch_df, ["k"], ["x"])
        # rewrite-the-view sink: fine for a test; production uses the
        # repo's versioned_write/merge_upsert sinks
        new_view.persist()
        new_view.count()
        new_view.write.mode("overwrite").parquet(str(sink))
        new_view.unpersist()

    q = (
        stream.writeStream.foreachBatch(refresh)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["k"]: (r["__cnt"], r["__sum_x"])
        for r in spark.read.parquet(str(sink)).collect()
    }

    multiset = Counter()
    for rows in batches:
        for k, x, w in rows:
            multiset[(k, x)] += w
    want = {}
    for (k, x), c in multiset.items():
        if c <= 0:
            continue
        n, s = want.get(k, (0, 0.0))
        want[k] = (n + c, s + c * x)

    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-9)


def test_stream_static_enrichment_equals_batch(spark, tmp_path):
    """Stream-static join: a file-source event stream enriched by a
    static dimension must produce exactly the batch join's rows —
    the dimension is re-read per micro-batch (Spark's stream-static
    contract), broadcast-joined, no state store involved."""
    from pyspark.sql import functions as F

    src = tmp_path / "stream"
    src.mkdir()
    rows = [(i, i % 4, float(i)) for i in range(40)]
    spark.createDataFrame(rows, "event_id long, seg_id int, v double").coalesce(
        1
    ).write.mode("overwrite").json(str(src / "b0"))

    dim = spark.createDataFrame(
        [(0, "bronze"), (1, "silver"), (2, "gold")], "seg_id int, tier string"
    )

    stream = spark.readStream.schema("event_id long, seg_id int, v double").json(
        str(src / "b*")
    )
    out_dir = tmp_path / "out"
    q = (
        stream.join(F.broadcast(dim), "seg_id")
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["event_id"], r["tier"])
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    want = {
        (r["event_id"], r["tier"])
        for r in spark.createDataFrame(
            rows, "event_id long, seg_id int, v double"
        )
        .join(dim, "seg_id")
        .collect()
    }
    assert got == want
    assert len(got) == 30  # seg 3 has no dimension row → inner-join drop
