"""Python DataSource connector (S16/S17): batch, pushdown, fetcher
injection, streaming exactly-once."""

import os
import tempfile
import textwrap

from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

from azuredataengineering_deeplearning_spark.sources import pydatasource as PDS


def _expected_rows(start, end, slice_s):
    rows = []
    for ws in range(start, end, slice_s):
        we = min(ws + slice_s, end)
        cursor = None
        while True:
            page, cursor = PDS.synthetic_feed(ws, we, cursor)
            rows.extend(page)
            if cursor is None:
                break
    return sorted(rows)


def _read(spark, start, end, slice_s=3600, **opts):
    PDS.register(spark)
    r = (
        spark.read.format("rest_windowed")
        .option("start", str(start))
        .option("end", str(end))
        .option("slice", str(slice_s))
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_matches_feed(spark):
    df = _read(spark, 0, 10_800)
    got = sorted(tuple(r) for r in df.collect())
    assert got == _expected_rows(0, 10_800, 3600)
    # one input partition per window slice
    assert df.rdd.getNumPartitions() == 3


def test_filter_pushdown_prunes_windows(spark):
    # unit: bounds reach the reader and drop non-overlapping windows
    r = PDS.RestWindowedReader({"start": "0", "end": "10800", "slice": "3600"})
    unhandled = r.pushFilters([GreaterThanOrEqual(("event_ts",), 7200)])
    assert len(list(unhandled)) == 1  # re-applied by Spark
    assert [(p.ws, p.we) for p in r.partitions()] == [(7200, 10800)]
    r2 = PDS.RestWindowedReader({"start": "0", "end": "10800", "slice": "3600"})
    r2.pushFilters([LessThan(("event_ts",), 3600)])
    assert [(p.ws, p.we) for p in r2.partitions()] == [(0, 3600)]
    # end-to-end: filtered read is still exact
    df = _read(spark, 0, 10_800).filter("event_ts >= 7200")
    got = sorted(tuple(r) for r in df.collect())
    assert got == [t for t in _expected_rows(0, 10_800, 3600) if t[0] >= 7200]


def test_custom_fetcher_shipped_via_pyfile(spark, tmp_path):
    # deployment story: the fetcher module ships to executors with
    # addPyFile and is resolved by name executor-side
    mod = tmp_path / "myfetch.py"
    mod.write_text(
        textwrap.dedent(
            """
            def fetch(ws, we, cursor):
                return [(ws, "x", 1.0, 0), (ws + 1, "y", 2.0, 0)], None
            """
        )
    )
    spark.sparkContext.addPyFile(str(mod))
    df = _read(spark, 100, 300, slice_s=100, fetcher="myfetch:fetch")
    got = sorted(tuple(r) for r in df.collect())
    assert got == [
        (100, "x", 1.0, 0), (101, "y", 2.0, 0),
        (200, "x", 1.0, 0), (201, "y", 2.0, 0),
    ]


def test_stream_matches_batch_and_restart_is_exactly_once(spark):
    PDS.register(spark)
    ck, out = tempfile.mkdtemp(), os.path.join(tempfile.mkdtemp(), "out")

    def run_once():
        q = (
            spark.readStream.format("rest_windowed")
            .option("start", "0").option("end", "7200").option("slice", "3600")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert got == _expected_rows(0, 7200, 3600)
    run_once()  # offsets fully consumed -> restart appends nothing
    assert spark.read.parquet(out).count() == len(got)
