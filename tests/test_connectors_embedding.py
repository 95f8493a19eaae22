import pytest
import pyspark.sql.functions as F

from azuredataengineering_deeplearning_spark.operators import embedding as EMB
from azuredataengineering_deeplearning_spark.sources import connectors as C
from azuredataengineering_deeplearning_spark.sources.writers import write_parquet


def test_rest_paginated_source(spark):
    pages = {None: ([(1, "a"), (2, "b")], "p2"), "p2": ([(3, "c")], None)}
    src = C.RestPaginatedSource(lambda cur: pages[cur], "id long, v string")
    df = src.read(spark)
    assert df.count() == 3
    assert {r.id for r in df.collect()} == {1, 2, 3}


def test_rest_source_empty(spark):
    src = C.RestPaginatedSource(lambda cur: ([], None), "id long, v string")
    assert src.read(spark).count() == 0


def test_parquet_standin_with_query(spark, tmp_path, sf_dir):
    src = C.ParquetStandIn(f"{sf_dir}/nation.parquet")
    df = src.read(spark, "SELECT n_name FROM {table} WHERE n_regionkey = 0")
    assert df.count() > 0
    assert df.columns == ["n_name"]


def test_list_files(spark, tmp_path):
    (tmp_path / "a.csv").write_text("x")
    (tmp_path / "b.txt").write_text("y")
    out = C.list_files(spark, str(tmp_path / "*"), suffix=".csv")
    assert [r.path.endswith("a.csv") for r in out.collect()] == [True]
    assert "content" not in out.columns  # metadata-only scan


def test_kusto_standin_contract(spark):
    import pytest

    with pytest.raises(NotImplementedError):
        C.KustoSource("https://cluster", "db").read(spark, "T | take 5")
    src = C.KustoSource(
        "https://cluster", "db",
        executor=lambda q: spark.createDataFrame([(q,)], "q string"),
    )
    assert src.read(spark, "T | take 5").collect()[0].q == "T | take 5"


def test_embed_column_deterministic_and_null_passthrough(spark):
    df = spark.createDataFrame(
        [(1, "spark query engine"), (2, None), (3, "spark query engine")],
        "id long, text string",
    )
    out = {r.id: r.embedding for r in EMB.embed_column(df, "text").collect()}
    assert out[2] is None
    assert out[1] == out[3]
    assert len(out[1]) == 16
    norm = sum(x * x for x in out[1]) ** 0.5
    assert abs(norm - 1.0) < 1e-5


def test_udf_flatten_equals_native(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "props")
    payload = F.concat(F.lit("["), F.col("props"), F.lit(","), F.col("props"), F.lit("]"))
    both = ev.select(
        "event_id",
        EMB.flatten_json_array_udf(payload).alias("via_udf"),
        EMB.flatten_json_array_native(payload, "k int", ["k"]).alias("via_native"),
    )
    assert both.filter(F.col("via_udf") != F.col("via_native")).count() == 0


def test_writers_roundtrip(spark, tmp_path, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    write_parquet(df, str(tmp_path / "p"), target_files=1, max_records_per_file=1000)
    back = spark.read.parquet(str(tmp_path / "p"))
    assert back.count() == df.count()
    import glob

    assert len(glob.glob(str(tmp_path / "p" / "*.parquet"))) == 1


def test_write_clustered_disjoint_ranges(spark, tmp_path):
    import pyarrow.parquet as pq
    import os

    from azuredataengineering_deeplearning_spark.sources.writers import write_clustered

    df = spark.range(0, 100_000).withColumn("k", F.col("id") % 1000)
    out = str(tmp_path / "clustered")
    write_clustered(df, out, cluster_by=["id"], target_files=8)
    files = [
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    ]
    assert len(files) == 8
    # per-file id ranges must be disjoint — that's what makes parquet
    # min/max stats selective (file skipping for range predicates)
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col = md.row_group(0).column(0)
        lo = col.statistics.min
        hi = pq.ParquetFile(f).metadata.row_group(md.num_row_groups - 1).column(0).statistics.max
        ranges.append((lo, hi))
    ranges.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi < b_lo
    # content intact
    assert spark.read.parquet(out).count() == 100_000


def test_compact_parquet_reduces_files(spark, tmp_path):
    import os

    from azuredataengineering_deeplearning_spark.sources.writers import compact_parquet

    out = str(tmp_path / "many")
    spark.range(0, 10_000).repartition(40).write.parquet(out)
    before = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert before >= 40
    n = compact_parquet(spark, out, target_file_mb=256)
    after = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert after == n == 1
    assert spark.read.parquet(out).count() == 10_000


@pytest.mark.slow
def test_bucketed_join_has_no_exchange(spark):
    from azuredataengineering_deeplearning_spark.sources.writers import write_bucketed

    a = spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    try:
        write_bucketed(a, "t_bucket_a", ["k"], 8, sort_by=["k"])
        write_bucketed(b, "t_bucket_b", ["k"], 8, sort_by=["k"])
        joined = spark.table("t_bucket_a").join(spark.table("t_bucket_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed join: no shuffle on either side
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 50_000
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


@pytest.mark.slow
def test_expire_partitions(spark, tmp_path):
    from azuredataengineering_deeplearning_spark.sources.writers import (
        expire_partitions,
        write_parquet,
    )

    out = str(tmp_path / "bydate")
    df = spark.createDataFrame(
        [(d, i) for i, d in enumerate(["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"])],
        ["ds", "v"],
    )
    write_parquet(df, out, partition_by=["ds"])
    deleted = expire_partitions(out, keep=2, partition_col="ds")
    assert deleted == ["ds=2024-01-01", "ds=2024-01-02"]
    # partition values come back type-inferred (DateType)
    left = {str(r.ds) for r in spark.read.parquet(out).select("ds").collect()}
    assert left == {"2024-01-03", "2024-01-04"}


@pytest.mark.slow
def test_write_zordered_locality_both_dims(spark, tmp_path):
    """Z-order layout: per-file min/max spans on BOTH dimensions are far
    tighter than the full range, so predicates on either column skip
    most files (single-key range clustering only helps its lead key)."""
    import pyspark.sql.functions as F

    from azuredataengineering_deeplearning_spark.sources.writers import write_zordered

    n = 1 << 14
    grid = spark.range(n).select(
        (F.col("id") % 128).alias("x"), (F.col("id") / 128).cast("long").alias("y")
    )
    out = str(tmp_path / "z")
    write_zordered(grid, out, ["x", "y"], bits=7, target_files=16)
    import glob

    files = glob.glob(f"{out}/*.parquet")
    assert len(files) >= 8
    spans_x, spans_y = [], []
    for f in files:
        row = spark.read.parquet(f).agg(
            F.min("x"), F.max("x"), F.min("y"), F.max("y")
        ).first()
        spans_x.append(row[1] - row[0])
        spans_y.append(row[3] - row[2])
    # average per-file span well under the full 0..127 range on BOTH dims
    assert sum(spans_x) / len(spans_x) < 64
    assert sum(spans_y) / len(spans_y) < 64


def test_density_cluster_distributed_equals_local(spark):
    """D11 contract: broadcast-model distributed predict is bit-identical
    to the local numpy approximate_predict, and noise gets label k."""
    import numpy as np

    from azuredataengineering_deeplearning_spark.operators import clustering as CL
    from azuredataengineering_deeplearning_spark.sources.readers import read_parquet

    e = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    model = CL.fit_density_clusters(e, "embedding", k=4, seed=7, max_sample=2000)
    assert model.centroids.shape[0] == 4 and model.noise_label == 4

    rows = e.select("vec_id", "embedding").collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    want_labels, want_strength = CL.approximate_predict(model, X)
    want = {r.vec_id: (l, s) for r, l, s in zip(rows, want_labels, want_strength)}

    got = {
        r.vec_id: (r.cluster, r.strength)
        for r in CL.predict_clusters(e, model, "embedding").collect()
    }
    assert set(got) == set(want)
    for vid, (l, s) in want.items():
        gl, gs = got[vid]
        assert gl == l and abs(gs - s) < 1e-12, vid

    # determinism of the fit (same data, same seed)
    m2 = CL.fit_density_clusters(e, "embedding", k=4, seed=7, max_sample=2000)
    assert np.array_equal(m2.centroids, model.centroids)
    assert np.array_equal(m2.radii, model.radii)

    # the noise radius actually fires: a far-away vector is noise
    far = spark.createDataFrame(
        [(999999, [1e6] * model.centroids.shape[1])], "vec_id long, embedding array<double>"
    )
    noise = CL.predict_clusters(far, model, "embedding").collect()[0]
    assert noise.cluster == model.noise_label and noise.strength == 0.0


def test_documents_corpus_is_ascii(spark, sf_dir):
    """The d2_embed_pandas_udf DuckDB oracle replays the FNV fold over
    per-char codepoints, which equals the python model's UTF-8 byte
    fold ONLY for ASCII text. Pin the corpus precondition so a
    testdata refresh that introduces multibyte text fails loudly here
    instead of as a silent oracle divergence."""
    from azuredataengineering_deeplearning_spark.sources.readers import read_parquet

    d = read_parquet(spark, f"{sf_dir}/documents.parquet", columns=["text"])
    from pyspark.sql import functions as F

    bad = d.filter(
        F.col("text").isNull()
        | (F.octet_length("text") != F.length("text"))
    ).count()
    assert bad == 0
