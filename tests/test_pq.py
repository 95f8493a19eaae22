"""Product quantization (FAISS PQ analog): ADC identity, exactness at
full codebook capacity, deterministic encoding."""

import numpy as np
import pytest

from azuredataengineering_deeplearning_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(7)
    rows = [(i, rng.normal(size=8).tolist()) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def _collect_vecs(df):
    return {r["vec_id"]: np.array(r["embedding"]) for r in df.collect()}


def test_adc_equals_dot_on_reconstruction(spark, vec_df):
    books = SIM.fit_pq_codebooks(vec_df, m=4, n_codes=8, seed=1, max_iter=10)
    codes_df = SIM.pq_encode(vec_df, books)
    codes = {r["vec_id"]: r["pq_codes"] for r in codes_df.collect()}
    q = vec_df.filter("vec_id < 3")
    out = SIM.pq_adc_topk(codes_df, q, books, k=40).collect()
    qvecs = _collect_vecs(q)
    ids = sorted(codes)
    recon = SIM.pq_reconstruct([codes[i] for i in ids], books)
    recon_by_id = dict(zip(ids, recon))
    for r in out:  # ADC score is exactly q . reconstruct(codes)
        expect = float(qvecs[r["query_id"]] @ recon_by_id[r["neighbor_id"]])
        assert abs(r["adc_score"] - expect) < 1e-9


def test_pq_exact_when_codebook_holds_all_points(spark):
    rng = np.random.default_rng(3)
    rows = [(i, rng.normal(size=6).tolist()) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    # n_codes == corpus size: every subvector is its own codeword ->
    # reconstruction is exact and ADC reduces to brute-force inner product
    books = SIM.fit_pq_codebooks(df, m=2, n_codes=8, seed=5, max_iter=25)
    codes_df = SIM.pq_encode(df, books)
    got = {
        (r["query_id"], r["neighbor_id"]): r["adc_score"]
        for r in SIM.pq_adc_topk(codes_df, df, books, k=7).collect()
    }
    V = _collect_vecs(df)
    for (qi, ni), s in got.items():
        assert abs(s - float(V[qi] @ V[ni])) < 1e-9
    # and the per-query ranking matches the exact ranking
    for qi in V:
        exact = sorted(
            ((float(V[qi] @ V[ni]), -ni) for ni in V if ni != qi), reverse=True
        )
        mine = sorted(
            ((s, -ni) for (q2, ni), s in got.items() if q2 == qi), reverse=True
        )
        assert [round(a[0], 9) for a in exact] == [round(b[0], 9) for b in mine]


def test_encode_is_deterministic_and_bounded(spark, vec_df):
    books = SIM.fit_pq_codebooks(vec_df, m=4, n_codes=8, seed=1, max_iter=10)
    a = {r["vec_id"]: r["pq_codes"] for r in SIM.pq_encode(vec_df, books).collect()}
    b = {r["vec_id"]: r["pq_codes"] for r in SIM.pq_encode(vec_df, books).collect()}
    assert a == b
    assert all(len(c) == 4 and max(c) < 8 and min(c) >= 0 for c in a.values())


def test_dim_must_divide_subspaces(spark, vec_df):
    with pytest.raises(ValueError, match="not divisible"):
        SIM.fit_pq_codebooks(vec_df, m=3, n_codes=4)


def test_ivf_pq_full_probe_equals_plain_adc(spark, vec_df):
    books = SIM.fit_pq_codebooks(vec_df, m=4, n_codes=8, seed=1, max_iter=10)
    cents = SIM.fit_ivf_centroids(vec_df, n_lists=4, seed=9, max_iter=8)
    q = vec_df.filter("vec_id < 3")
    full = SIM.ivf_pq_topk(vec_df, q, cents, books, k=5, nprobe=4).collect()
    codes_df = SIM.pq_encode(vec_df, books).select("vec_id", "pq_codes")
    plain = SIM.pq_adc_topk(codes_df, q, books, k=5).collect()
    key = lambda r: (r["query_id"], r["neighbor_id"], round(r["adc_score"], 9))
    assert sorted(map(key, full)) == sorted(map(key, plain))


def test_ivf_pq_pruned_scores_are_true_adc_values(spark, vec_df):
    books = SIM.fit_pq_codebooks(vec_df, m=4, n_codes=8, seed=1, max_iter=10)
    cents = SIM.fit_ivf_centroids(vec_df, n_lists=4, seed=9, max_iter=8)
    q = vec_df.filter("vec_id < 3")
    pruned = SIM.ivf_pq_topk(vec_df, q, cents, books, k=5, nprobe=1).collect()
    codes_df = SIM.pq_encode(vec_df, books).select("vec_id", "pq_codes")
    truth = {
        (r["query_id"], r["neighbor_id"]): r["adc_score"]
        for r in SIM.pq_adc_topk(codes_df, q, books, k=40).collect()
    }
    assert len(pruned) > 0
    for r in pruned:  # pruning may drop pairs but never distorts a score
        assert abs(r["adc_score"] - truth[(r["query_id"], r["neighbor_id"])]) < 1e-9
