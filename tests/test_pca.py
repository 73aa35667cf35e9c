"""Distributed PCA (operators/pca.py): algebraic invariants + exact
parity with a single-node numpy PCA on the same data — the distributed
sufficient-statistics path must reproduce the driver-only computation
to float tolerance regardless of partitioning."""

from __future__ import annotations

import numpy as np
import pytest

from investcloud_data_pipeline_spark.operators.pca import (
    PCAModel,
    pca_fit,
    pca_project,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    from investcloud_data_pipeline_spark.sources.batch import load_table

    return load_table(spark, SF, "embeddings")


@pytest.fixture(scope="module")
def model(emb):
    return pca_fit(emb, "embedding", k=8)


def _local_reference(emb, k):
    rows = emb.select("embedding").collect()
    m = np.array([r[0] for r in rows], dtype=np.float64)
    mean = m.mean(axis=0)
    cov = np.cov(m, rowvar=False, ddof=1)
    eigvals, eigvecs = np.linalg.eigh((cov + cov.T) / 2.0)
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, eigvals[order]


def test_basis_is_orthonormal(model):
    w = model.components
    assert np.allclose(w @ w.T, np.eye(model.k), atol=1e-10)


def test_explained_variance_descending_nonnegative(model):
    ev = model.explained_variance
    assert np.all(np.diff(ev) <= 1e-12)
    assert np.all(ev >= -1e-12)


def test_matches_single_node_numpy_pca(emb, model):
    mean, comps, ev = _local_reference(emb, 8)
    assert np.allclose(model.mean, mean, atol=1e-9)
    assert np.allclose(model.explained_variance, ev, atol=1e-9)
    # eigenvectors may differ by float noise; compare via |cosine| ≈ 1
    cos = np.abs(np.sum(model.components * comps, axis=1))
    assert np.allclose(cos, 1.0, atol=1e-8)


def test_fit_invariant_to_repartitioning(emb, model):
    shuffled = emb.repartition(7)
    m2 = pca_fit(shuffled, "embedding", k=8, fanin=3)
    assert np.allclose(m2.mean, model.mean, atol=1e-9)
    assert np.allclose(
        m2.explained_variance, model.explained_variance, atol=1e-9
    )
    cos = np.abs(np.sum(m2.components * model.components, axis=1))
    assert np.allclose(cos, 1.0, atol=1e-8)


def test_projection_variance_matches_eigenvalues(emb, model):
    proj = pca_project(emb, model, "embedding").select("pc").collect()
    p = np.array([r[0] for r in proj])
    assert np.allclose(
        p.var(axis=0, ddof=1), model.explained_variance, atol=1e-8
    )
    # projections of centered data have ~zero mean per axis
    assert np.allclose(p.mean(axis=0), 0.0, atol=1e-9)


def test_projection_handles_null_vectors(spark, model):
    import pandas as pd

    d = model.mean.shape[0]
    pdf = pd.DataFrame(
        {"id": [1, 2], "embedding": [list(np.ones(d)), None]}
    )
    df = spark.createDataFrame(pdf)
    out = {
        r["id"]: r["pc"]
        for r in pca_project(df, model, "embedding").collect()
    }
    assert out[2] is None
    assert out[1] is not None and len(out[1]) == model.k


def test_fit_rejects_bad_inputs(spark, emb):
    with pytest.raises(ValueError, match="exceeds dimension"):
        pca_fit(emb, "embedding", k=10_000)
