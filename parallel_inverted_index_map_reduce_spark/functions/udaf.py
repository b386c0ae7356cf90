"""User-defined aggregate surface: Arrow-batched grouped aggregation.

The reference has no extension points at all (SURVEY.md §2.1); this
module is the engine's UDAF story. The rule stays "UDFs are the slow
path": anything expressible with built-in expressions should use them
(every registry query does). When custom math is genuinely needed, the
right Spark shape is a GROUPED_AGG pandas_udf — Arrow ships each
group's column as ONE numpy batch to Python, the aggregation is
vectorized, and Catalyst still plans the surrounding groupBy/shuffle —
never a row-at-a-time Python UDF.

Closures only (no module-level references inside the UDF body) per the
engine's pickling constraint for driver-owned sessions.
"""

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def geometric_mean_udaf() -> Column:
    """GROUPED_AGG geometric mean over a positive double column.

    Built as log-space mean to stay overflow-safe at any group size;
    vectorized numpy inside, one Arrow batch per group partition.
    (The Series -> scalar type hints are what mark this as GROUPED_AGG
    for Spark's pandas_udf inference.)
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        import numpy as np

        x = v.dropna()
        if len(x) == 0:
            return float("nan")
        return float(np.exp(np.log(x.to_numpy()).mean()))

    return geo_mean


def geometric_mean_expr(col: Column) -> Column:
    """The same aggregate as built-in expressions (exp of avg of ln) —
    the preferred form, and the test oracle for the UDAF."""
    return F.exp(F.avg(F.ln(col)))
