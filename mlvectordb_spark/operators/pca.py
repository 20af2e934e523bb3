"""Distributed PCA / whitening over an embedding column.

The standard embedding-preprocessing step for a training-data pipeline
(dim reduction before ANN indexing, decorrelation before quantization —
e.g. the OPQ/PCA rotation step in public FAISS practice). The reference
has no analog (vectors are served as ingested, hnswlib wrapper,
implementations/index.py); this belongs to the LLM-pipeline extension
layer.

Scale design — the classic two-phase moment aggregation:

1. **Partials** (distributed): one `mapInPandas` pass emits, per
   partition, the triple (n, Σx, Σxxᵀ) — a single row of d + d² doubles.
   For d=64 that is 32 KB/partition; the driver collects ≤ one row per
   partition regardless of table size (100 TB → still |partitions| rows).
   Bound: d ≲ 2000 keeps a partial under ~32 MB — embedding dims in
   practice are far below that.
2. **Eig** (driver): covariance = (Σxxᵀ − n·μμᵀ)/(n−1) is a d×d local
   matrix; `numpy.linalg.eigh` is exact, deterministic, and O(d³) —
   microseconds at d=64. Partials are summed in partition order (sorted)
   so the fit is bit-deterministic for a fixed layout.
3. **Project** (distributed): an Arrow-batched pandas UDF applies the
   (k,d) component matrix as one BLAS matmul per batch — no shuffle, no
   per-row Python.

Sign convention: each component is flipped so its largest-|entry|
coordinate is positive — eigenvectors are sign-deterministic across
platforms."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.ArrayType(T.DoubleType())),
        T.StructField("o", T.ArrayType(T.DoubleType())),
    ]
)


@dataclass
class PCAModel:
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (k, d) rows = principal axes, descending var
    explained_variance: np.ndarray  # (k,)
    total_variance: float  # trace of the covariance
    n: int

    @property
    def explained_ratio(self) -> np.ndarray:
        return self.explained_variance / max(self.total_variance, 1e-300)


def moment_partials(df: DataFrame, vec_col: str) -> DataFrame:
    """The distributed phase: (n, Σx, Σxxᵀ) per partition, one output row
    each. This is the ONLY pass over the data."""

    def gen(batches):
        n = 0
        s = None
        o = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += mat.shape[0]
            bs = mat.sum(axis=0)
            bo = mat.T @ mat
            s = bs if s is None else s + bs
            o = bo if o is None else o + bo
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [s.tolist()],
                    "o": [o.ravel().tolist()],
                }
            )

    out = df.select(vec_col).mapInPandas(gen, schema=_PARTIAL_SCHEMA)
    return out.withColumn("pid", F.spark_partition_id())


def covariance(df: DataFrame, vec_col: str) -> tuple[np.ndarray, np.ndarray, int]:
    """Driver-side reduction of the partials: (mean, cov, n). Partials are
    summed in partition order for determinism."""
    rows = sorted(moment_partials(df, vec_col).collect(), key=lambda r: r["pid"])
    if not rows:
        raise ValueError("empty input: cannot fit PCA over zero vectors")
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.zeros(d)
    o = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        o += np.asarray(r["o"]).reshape(d, d)
    mean = s / n
    if n < 2:
        return mean, np.zeros((d, d)), n
    cov = (o - n * np.outer(mean, mean)) / (n - 1)
    # enforce exact symmetry (FP asymmetry ~1e-16 would leak into eigh)
    cov = (cov + cov.T) / 2.0
    return mean, cov, n


def fit_pca(df: DataFrame, vec_col: str, k: int) -> PCAModel:
    mean, cov, n = covariance(df, vec_col)
    d = cov.shape[0]
    k = min(k, d)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, d)
    # deterministic sign: largest-|entry| coordinate positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=mean,
        components=comps,
        explained_variance=np.maximum(vals[order], 0.0),
        total_variance=float(np.trace(cov)),
        n=n,
    )


def project(
    df: DataFrame,
    vec_col: str,
    model: PCAModel,
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Append `out_col` = components @ (x - mean), optionally whitened
    (unit variance per axis). One BLAS matmul per Arrow batch."""
    comps = model.components.copy()
    if whiten:
        comps = comps / np.sqrt(model.explained_variance + eps)[:, None]
    mean = model.mean

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _proj(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack(col.to_numpy()).astype(np.float64)
        out = (mat - mean) @ comps.T
        return pd.Series(list(out))

    return df.withColumn(out_col, _proj(F.col(vec_col)))
