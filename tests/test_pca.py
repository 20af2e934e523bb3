"""PCA (operators/pca.py): numpy parity for the driver-side math, exact
moment parity for the distributed kernel, projection/whitening contracts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.operators.pca import covariance, fit_pca, project


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(7)
    # anisotropic: axis 0 has 5x the std of axis 3
    base = rng.normal(size=(500, 6)) * np.array([5.0, 2.0, 1.0, 0.2, 1.5, 0.7])
    rot, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    mat = base @ rot + np.array([1.0, -2.0, 0.5, 0.0, 3.0, -1.0])
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(mat)], "id bigint, vec array<double>"
    ).repartition(8)
    return mat, df


def test_covariance_matches_numpy(data):
    mat, df = data
    mean, cov, n = covariance(df, "vec")
    assert n == 500
    np.testing.assert_allclose(mean, mat.mean(axis=0), rtol=0, atol=1e-10)
    np.testing.assert_allclose(cov, np.cov(mat, rowvar=False), rtol=0, atol=1e-9)


def test_fit_matches_numpy_eig(data):
    mat, df = data
    model = fit_pca(df, "vec", k=6)
    ref_vals = np.sort(np.linalg.eigvalsh(np.cov(mat, rowvar=False)))[::-1]
    np.testing.assert_allclose(model.explained_variance, ref_vals, atol=1e-8)
    assert model.total_variance == pytest.approx(
        float(np.trace(np.cov(mat, rowvar=False))), abs=1e-9
    )
    # components are orthonormal rows
    np.testing.assert_allclose(
        model.components @ model.components.T, np.eye(6), atol=1e-10
    )
    # deterministic sign: largest-|entry| coordinate positive
    for row in model.components:
        assert row[int(np.argmax(np.abs(row)))] > 0
    # spectrum descending, ratios sum to 1 for full rank
    assert list(model.explained_variance) == sorted(
        model.explained_variance, reverse=True
    )
    assert model.explained_ratio.sum() == pytest.approx(1.0, abs=1e-9)


def test_projection_variance_equals_eigenvalue(data):
    _mat, df = data
    model = fit_pca(df, "vec", k=3)
    proj = project(df, "vec", model, out_col="p")
    rows = np.stack([np.asarray(r["p"]) for r in proj.select("p").collect()])
    # projected coords are centered; per-axis sample variance == eigenvalue
    np.testing.assert_allclose(rows.mean(axis=0), 0.0, atol=1e-9)
    np.testing.assert_allclose(
        rows.var(axis=0, ddof=1), model.explained_variance, rtol=1e-8
    )


def test_whitening_unit_variance(data):
    _mat, df = data
    model = fit_pca(df, "vec", k=4)
    white = project(df, "vec", model, out_col="w", whiten=True)
    rows = np.stack([np.asarray(r["w"]) for r in white.select("w").collect()])
    np.testing.assert_allclose(rows.var(axis=0, ddof=1), 1.0, rtol=1e-6)


def test_partition_layout_invariance(data):
    """The fit must not depend on how rows are partitioned."""
    mat, df = data
    m1 = fit_pca(df.repartition(2), "vec", k=3)
    m2 = fit_pca(df.repartition(17), "vec", k=3)
    np.testing.assert_allclose(
        m1.explained_variance, m2.explained_variance, rtol=1e-12
    )
    np.testing.assert_allclose(m1.components, m2.components, atol=1e-9)


def test_k_clamped_and_empty_raises(spark, data):
    _mat, df = data
    model = fit_pca(df, "vec", k=99)
    assert model.components.shape == (6, 6)
    empty = df.filter(F.col("id") < 0)
    with pytest.raises(ValueError, match="empty"):
        fit_pca(empty, "vec", k=2)


def test_moment_state_incremental_matches_batch(spark, data, tmp_path):
    """The r11 mergeable form: per-chunk MomentState folds (with a
    replayed batch — must be a no-op) reproduce the one-shot batch fit
    over the union, without ever re-reading earlier chunks."""
    from mlvectordb_spark.operators.pca import (
        MomentState,
        apply_pca_moments_batch,
    )

    mat, df = data
    path = str(tmp_path / "moments.npz")
    chunks = [
        df.filter(F.col("id") < 150),
        df.filter((F.col("id") >= 150) & (F.col("id") < 400)),
        df.filter(F.col("id") >= 400),
    ]
    for bid, chunk in enumerate(chunks):
        apply_pca_moments_batch(path, chunk, bid, "vec")
    # replayed micro-batch (foreachBatch retry): already-counted id is
    # a no-op, nothing double-counts
    st_before = MomentState.load(path)
    apply_pca_moments_batch(path, chunks[1], 1, "vec")
    st = MomentState.load(path)
    assert st.n == st_before.n == 500 and st.last_batch_id == 2

    inc = st.to_model(4)
    ref = fit_pca(df, "vec", 4)
    np.testing.assert_allclose(inc.mean, ref.mean, atol=1e-10)
    np.testing.assert_allclose(
        inc.components, ref.components, atol=1e-8
    )
    np.testing.assert_allclose(
        inc.explained_variance, ref.explained_variance, rtol=1e-10
    )
    # states merge exactly and dimension mismatches are rejected
    merged = MomentState.of(chunks[0], "vec").merge(
        MomentState.of(chunks[1], "vec")
    ).merge(MomentState.of(chunks[2], "vec"))
    np.testing.assert_allclose(merged.o, st.o, rtol=1e-12)
    with pytest.raises(ValueError, match="dimension"):
        merged.merge(MomentState(n=1, s=np.zeros(3), o=np.zeros((3, 3))))


def test_start_pca_moments_stream(spark, data, tmp_path):
    """End-to-end Structured Streaming accumulation: a file-source
    stream of vector chunks drives start_pca_moments; the persisted
    state equals the batch covariance over everything ingested."""
    from mlvectordb_spark.operators.pca import MomentState, start_pca_moments

    mat, df = data
    src = str(tmp_path / "src")
    for i, (lo, hi) in enumerate([(0, 200), (200, 500)]):
        df.filter(
            (F.col("id") >= lo) & (F.col("id") < hi)
        ).write.mode("overwrite").parquet(f"{src}/chunk={i}")
    stream = spark.readStream.schema("id bigint, vec array<double>").option(
        "recursiveFileLookup", "true"
    ).parquet(src)
    state_path = str(tmp_path / "stream_moments.npz")
    q = start_pca_moments(
        stream, "vec", state_path,
        checkpoint_dir=str(tmp_path / "ckpt"), trigger_once=True,
    )
    q.awaitTermination(120)
    st = MomentState.load(state_path)
    assert st.n == 500
    mean, cov = st.mean_cov()
    np.testing.assert_allclose(mean, mat.mean(axis=0), atol=1e-10)
    np.testing.assert_allclose(
        cov, np.cov(mat, rowvar=False), atol=1e-8
    )
