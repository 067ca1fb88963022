"""User-defined aggregates (SURVEY §2.10 X3) as Arrow-batched
grouped-agg pandas UDFs.

The reference's aggregation surface is entirely built-in SQL, so X3
exists to prove the engine's extension point: a custom aggregate that
Catalyst treats like any other agg expression (partial-agg pushdown
does NOT apply — Spark ships whole groups to Python — so UDAFs here
are for semantics builtins can't express, never for speed).

Exactness posture: the only shipped UDAF aggregates *integer units*
(long cents), where numpy's interpolated median is exact binary
arithmetic — the oracle's ``quantile_cont`` on the same integers
produces the bit-identical double.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F


@F.pandas_udf("double")
def median_long(v: pd.Series) -> float:
    """Exact interpolated median of an integer-valued column.

    For long inputs both the midpoint sum and the /2 are exact in
    double, so the result is engine-independent (numpy's linear
    interpolation ≡ SQL ``quantile_cont(x, 0.5)``).
    """
    return float(np.median(v.to_numpy()))
