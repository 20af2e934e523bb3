"""NN-descent convergence probe (r9 verdict #5): measure, on one
50k×64d clustered block — the SAME corpus as the r9 descent_rho grid
(8 uniform centers ±10, noise ±0.1, rng seed 3), so the δ rows land in
the same SCALING.md table —

1. the per-round update rate of NN-descent at the shipped pool width
   (pool = 3m = 24): does the update count decay below Dong et al.'s
   δ·n·k before the round cap (i.e. does the existing early stop ever
   fire), and how much wall time do the late rounds cost;
2. a δ grid: full single-block graph builds at several descent_delta
   values, each evaluated for in-block bounded-beam recall@10 at the
   serving dials (ef=64/128) against exact brute force — the r9 rho
   grid's exact evaluation procedure (16 seeded self-queries).

Usage: python tools/descent_probe.py [n] [deltas...]
       (defaults: 50_000 / 0.001 0.005 0.01 0.02)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from mlvectordb_spark.operators.graph_ann import (
    _beam_search,
    _build_block_graph,
    _descent_pool,
)

K = 10
M = 8
EFC = 64
POOL_K = max(3 * M, 24)


def corpus(n: int) -> np.ndarray:
    """The r9 rho-grid corpus: 8 well-separated uniform clusters."""
    rng = np.random.default_rng(3)
    dim, ncl = 64, 8
    centers = rng.uniform(-10, 10, size=(ncl, dim))
    lab = rng.integers(0, ncl, size=n)
    return (
        centers[lab] + rng.uniform(-0.1, 0.1, size=(n, dim))
    ).astype(np.float32)


def grid_recall(X: np.ndarray, adj, entries, qs) -> dict[int, float]:
    recs: dict[int, list[float]] = {64: [], 128: []}
    for qi in qs:
        q = X[qi]
        d = ((X.astype(np.float64) - q.astype(np.float64)) ** 2).sum(axis=1)
        exact = set(np.argpartition(d, K)[:K].tolist())
        for ef in (64, 128):
            got = {p for _, p in _beam_search(X, adj, entries, q, ef, "l2")[:K]}
            recs[ef].append(len(got & exact) / K)
    return {ef: round(float(np.mean(v)), 3) for ef, v in recs.items()}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    deltas = (
        [float(a) for a in sys.argv[2:]]
        if len(sys.argv) > 2
        else [0.001, 0.005, 0.01, 0.02]
    )
    X = corpus(n)
    qs = np.random.default_rng(3).integers(0, n, size=16)
    print(f"block: {X.shape} (8 clusters), pool_k={POOL_K}, rounds cap=8")

    # ---- 1. per-round update rate (δ=0 → never stops early) ----
    stats: list = []
    t0 = time.time()
    _descent_pool(X, POOL_K, "l2", 42, 8, rho=1.0, delta=0.0, stats=stats)
    total = time.time() - t0
    nk = X.shape[0] * POOL_K
    print(f"descent_pool δ=0: {total:.1f}s total")
    for i, (changed, sec) in enumerate(stats):
        print(
            f"  round {i + 1}: changed={changed} "
            f"(rate {changed / nk:.5f}) {sec:.1f}s"
        )

    # ---- 2. δ grid: full build + serving recall ----
    for delta in deltas:
        t0 = time.time()
        adj, entries = _build_block_graph(
            X, M, EFC, "l2", seed=42, exact_pool_max=256,
            descent_delta=delta,
        )
        build = time.time() - t0
        rec = grid_recall(X, adj, entries, qs)
        print(
            f"delta={delta}: build {build:.1f}s, in-block recall@{K} "
            f"ef=64: {rec[64]} ef=128: {rec[128]}"
        )


if __name__ == "__main__":
    main()
