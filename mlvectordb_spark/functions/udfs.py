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
