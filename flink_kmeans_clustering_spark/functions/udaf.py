"""User-defined aggregates via Arrow-batched pandas UDFs.

The reference's UDF surface is Flink's Rich*/ReduceFunction classes
(SURVEY.md §2.5); Spark-side, scalar work belongs in column expressions
and custom *aggregation* in ``pandas_udf`` GROUPED_AGG — whole groups
arrive as pandas Series over Arrow, aggregate Python runs once per
group, never per row.  Use only when no built-in aggregate composes to
the same result cheaper (the geometric mean here is equally exp(avg(ln))
in pure SQL — it doubles as the correctness oracle for the UDAF path).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def _geometric_mean_udaf():
    # built lazily: pandas_udf resolves its return type against the
    # active session, so decorating at import time would require one

    @pandas_udf(DoubleType())
    def geometric_mean(v: pd.Series) -> float:
        """Geometric mean over the POSITIVE support of the column.

        The geometric mean is undefined at ≤ 0 (ln blows up); the
        portable contract — matching ``EXP(AVG(LN(value)) FILTER
        (WHERE value > 0))`` in any SQL engine — is to aggregate the
        positive values only, NaN when none exist.
        """
        import numpy as np

        x = v.dropna()
        x = x[x > 0]
        if len(x) == 0:
            return float("nan")
        return float(np.exp(np.log(x.to_numpy(dtype="float64")).mean()))

    return geometric_mean


def geomean(col: str | Column) -> Column:
    """Aggregate expression: geometric mean via the pandas UDAF."""
    return _geometric_mean_udaf()(F.col(col) if isinstance(col, str) else col)
