"""Pandas UDF definitions (UDF/UDAF surface, SURVEY.md §2.4).

NOTE: deliberately NO `from __future__ import annotations` here —
pandas_udf infers eval type from REAL type hints, and postponed (string)
annotations referencing local imports break that inference.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def py_token_count(texts: pd.Series) -> pd.Series:
    """Scalar pandas UDF (Arrow-batched): whitespace token count."""
    return texts.str.split(" ").map(lambda t: sum(1 for x in t if x))


@pandas_udf("double")
def geomean(v: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (UDAF): geometric mean."""
    return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))


def chunk_doc_udtf():
    """Python UDTF (the §2.4 table-function surface): one input row ->
    n_chunks output rows, same overlapping-token-window semantics as the
    native `operators/curation.chunk_documents` (which stays the hot path
    — a UDTF is row-at-a-time Python and exists here to cover the
    LATERAL-join table-function API, oracle-shared with `doc_chunks`).

    Returned lazily from a factory because the @udtf decorator needs no
    SparkContext but keeps import side effects out of module load.
    """
    import hashlib
    import math

    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_tokens int, chunk_hash string")
    class ChunkDoc:
        def eval(self, text: str, chunk_size: int, stride: int):
            toks = [t for t in (text or "").split(" ") if t]
            n_chunks = (
                int(math.ceil(max(len(toks) - chunk_size, 0) / float(stride)))
                + 1
            )
            for idx in range(n_chunks):
                chunk = toks[idx * stride : idx * stride + chunk_size]
                yield (
                    idx,
                    len(chunk),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )

    return ChunkDoc
