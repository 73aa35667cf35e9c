"""Distributed PCA over embedding columns.

The classic "aggregate small sufficient statistics on the cluster,
solve on the driver, broadcast the model back" pattern — the shape
Spark MLlib's own PCA/linear models use, re-expressed on the DataFrame
API without an MLlib dependency:

* **Stage 1 (map):** every partition folds its rows into ONE
  sufficient-statistics row — count, per-dimension sum, and the
  flattened d×d Gram matrix. O(d²) bytes per partition regardless of
  how many rows the partition holds, computed as a single numpy
  ``M.T @ M`` per Arrow batch (BLAS, no per-row Python).
* **Stage 2 (tree reduce):** partials shuffle to ``fanin`` reducers
  keyed by ``partition_id % fanin``, each summing its group. The driver
  then collects only ``fanin`` rows — at 100 TB with ~10⁶ tasks a flat
  collect of per-partition partials would be ~30 GB on the driver; the
  tree level caps it at ``fanin × O(d²)`` no matter the input size.
* **Stage 3 (driver):** covariance from the Gram matrix
  (Cov = (G − n·μμᵀ)/(n−1)), ``numpy.linalg.eigh`` (d×d — trivial for
  embedding dims), top-k eigenvectors with a canonical sign (the
  largest-|loading| coordinate is made positive, so the fit is
  deterministic — eigenvectors are otherwise sign-ambiguous).
* **Projection:** an Arrow-batched pandas UDF applying
  ``(X − μ) @ Wᵀ`` per batch; the (k×d) model rides the closure
  (a few KB — broadcast by the task serializer).

The d×d Gram matrix bounds this to embedding-sized d (≤ ~4096 dims →
128 MB partials); beyond that, randomized-projection sketches are the
right tool — out of scope here.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_PARTIAL_SCHEMA = (
    "key long, n long, s array<double>, g array<double>"
)
_SUM_SCHEMA = "n long, s array<double>, g array<double>"


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray           # (d,)
    components: np.ndarray     # (k, d) rows = principal axes
    explained_variance: np.ndarray  # (k,) eigenvalues, descending

    @property
    def k(self) -> int:
        return self.components.shape[0]


def _partial_kernel(batches):
    n = 0
    s = None
    g = None
    key = 0
    for pdf in batches:
        if len(pdf) == 0:
            continue
        key = int(pdf["__pid"].iloc[0])
        vecs = pdf["__vec"].dropna()
        if len(vecs) == 0:
            continue
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        n += m.shape[0]
        bs = m.sum(axis=0)
        bg = m.T @ m
        s = bs if s is None else s + bs
        g = bg if g is None else g + bg
    if n:
        yield pd.DataFrame(
            {"key": [key], "n": [n], "s": [list(s)], "g": [list(g.ravel())]}
        )


def _tree_sum(key, pdfs):
    n = 0
    s = None
    g = None
    for pdf in pdfs:
        for _, row in pdf.iterrows():
            n += int(row["n"])
            rs = np.asarray(row["s"], dtype=np.float64)
            rg = np.asarray(row["g"], dtype=np.float64)
            s = rs if s is None else s + rs
            g = rg if g is None else g + rg
    return pd.DataFrame({"n": [n], "s": [list(s)], "g": [list(g)]})


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    fanin: int = 64,
) -> PCAModel:
    """Fit a PCA model via the 3-stage sufficient-statistics plan above.

    Runs exactly two Spark jobs' worth of work in one action: the
    per-partition fold, the ``fanin``-way tree reduce, and a collect of
    ``fanin`` tiny rows.
    """
    from ..functions.vectors import to_double_array

    prepared = df.select(
        F.spark_partition_id().alias("__pid"),
        to_double_array(vec_col).alias("__vec"),
    )
    partials = prepared.mapInPandas(_partial_kernel, _PARTIAL_SCHEMA)
    reduced = (
        partials.withColumn("key", F.col("key") % fanin)
        .groupBy("key")
        .applyInPandas(lambda key, pdf: _tree_sum(key, [pdf]), _SUM_SCHEMA)
    )
    rows = reduced.collect()
    if not rows:
        raise ValueError("pca_fit: input has no non-null vectors")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g_flat = np.sum([np.asarray(r["g"]) for r in rows], axis=0)
    d = s.shape[0]
    if n < 2:
        raise ValueError("pca_fit: need at least 2 vectors")
    if k > d:
        raise ValueError(f"pca_fit: k={k} exceeds dimension d={d}")
    mean = s / n
    gram = g_flat.reshape(d, d)
    cov = (gram - n * np.outer(mean, mean)) / (n - 1)
    # symmetrize away float drift so eigh sees an exactly-symmetric input
    cov = (cov + cov.T) / 2.0
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    components = eigvecs[:, order].T  # (k, d)
    # canonical sign: make the largest-|loading| coordinate positive
    for i in range(components.shape[0]):
        j = int(np.argmax(np.abs(components[i])))
        if components[i, j] < 0:
            components[i] = -components[i]
    return PCAModel(
        mean=mean,
        components=components,
        explained_variance=eigvals[order],
    )


def pca_project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pc",
) -> DataFrame:
    """Project ``vec_col`` onto the model's principal axes: appends
    ``out_col`` = array<double> of length k ((x − μ)·Wᵀ per row,
    computed as one BLAS matmul per Arrow batch)."""
    mean = model.mean
    comps_t = model.components.T  # (d, k)

    @pandas_udf("array<double>")
    def _proj(v: pd.Series) -> pd.Series:
        mask = v.notna().to_numpy()
        vals: list = [None] * len(v)
        if mask.any():
            m = np.vstack(v[mask].to_numpy()).astype(np.float64)
            p = (m - mean) @ comps_t
            for i, row in zip(np.flatnonzero(mask), p):
                vals[i] = row.tolist()
        return pd.Series(vals, dtype=object)

    from ..functions.vectors import to_double_array

    return df.withColumn(out_col, _proj(to_double_array(vec_col)))
