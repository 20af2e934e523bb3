"""Distance / similarity kernels as native Catalyst column expressions.

The reference's kernels live inside hnswlib (C++): squared-L2 for the `l2`
space, 1−cos for `cosine`, negative dot for `ip`
(`/root/reference/src/mlvectordb/implementations/index.py:18,126-127`).
Here each metric is an honest, exact column expression built from
`zip_with` + `aggregate` — JVM-side, whole-stage-codegen'd, no Python in
the hot path. That keeps a 100 TB scan entirely inside Tungsten; a pandas
UDF would move every row through Arrow for a 64-float dot product.

All math is done in DOUBLE regardless of the (float32) storage type so
results are reproducible against external oracles; the fold is sequential
left-to-right, matching a scalar loop.

`metric_expr` exposes the reference's metric names:
- "l2"     → squared L2 distance (hnswlib returns squared distances)
- "cosine" → cosine *similarity* (the reference post-processes 1−dist back
             to similarity at `implementations/index.py:126-127`)
- "ip"     → inner product (hnswlib ip space scores by -dot; we surface the
             honest dot product and let callers sort descending)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _to_double(col: ColumnOrName) -> Column:
    return F.transform(_c(col), lambda x: x.cast("double"))


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Inner product <a, b> as a sequential double fold."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_sq(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Squared Euclidean distance (the reference's `l2` space score)."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_dist(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Euclidean distance (sqrt of l2_sq) — matches DuckDB list_distance."""
    return F.sqrt(l2_sq(a, b))


def norm2(a: ColumnOrName) -> Column:
    """L2 norm of a vector column."""
    return F.sqrt(dot(a, a))


def cosine_sim(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine similarity dot/(|a||b|) — matches DuckDB list_cosine_similarity."""
    return dot(a, b) / (norm2(a) * norm2(b))


def normalize(a: ColumnOrName, decimals: int | None = None) -> Column:
    """Unit-normalize a vector column (declared Vector.normalize, README:180).

    Returns array<double>. `decimals` optionally rounds each component (used
    for oracle-stable output)."""
    n = norm2(a)
    if decimals is None:
        return F.transform(_to_double(a), lambda x: x / n)
    return F.transform(_to_double(a), lambda x: F.round(x / n, decimals))


_METRICS = ("l2", "cosine", "ip")


def metric_expr(a: ColumnOrName, b: ColumnOrName, metric: str = "cosine") -> Column:
    """Score column for a reference metric name; see module docstring."""
    if metric == "l2":
        return l2_sq(a, b)
    if metric == "cosine":
        return cosine_sim(a, b)
    if metric == "ip":
        return dot(a, b)
    raise ValueError(f"unknown metric {metric!r}; expected one of {_METRICS}")


def metric_ascending(metric: str) -> bool:
    """True when smaller scores are better (distance-like metrics)."""
    if metric == "l2":
        return True
    if metric in ("cosine", "ip"):
        return False
    raise ValueError(f"unknown metric {metric!r}; expected one of {_METRICS}")
