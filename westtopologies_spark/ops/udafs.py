"""Custom aggregate functions on the Arrow-vectorized Pandas UDAF
path (``pandas_udf`` with a grouped-agg signature).

The reference's only custom aggregation is the hand-rolled count
buffer of ``TopicModelBolt.java:87-99``; here custom aggregates slot
into Catalyst as first-class ``AggregateFunction``s: they combine
with built-in aggregates in one ``groupBy``, benefit from
whole-stage codegen around the exchange, and move data via Arrow
batches (not row-at-a-time pickling).

Note the scale trade-off: a grouped-agg pandas_udf materializes each
group's column in memory and does NOT do partial aggregation
map-side, so the shuffle carries raw rows.  Use it for moderate
group sizes or re-express as algebraic built-ins when possible —
``geometric_mean`` below has the algebraic form exp(avg(ln x)),
which IS partially aggregatable; the UDAF variant exists to
exercise and document the custom-aggregate path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geometric_mean(v: pd.Series) -> float:
    """exp(mean(ln v)) over the group, NaN-safe for non-positive
    inputs (they are excluded, matching ln semantics in SQL).

    DETERMINISTIC construction (rule 17): numpy's libm log/exp differ
    from every other engine by ulps AND a float mean is order-
    dependent — instead each ln comes from the shared exactly-rounded
    det_ln chain, is quantized to an integer (1e-9 grid), summed
    EXACTLY in Python ints, and the mean is one division fed to the
    shared det_exp — so the UDAF, the Spark-SQL expression form, and
    the DuckDB oracle produce the identical double."""
    import math

    from .model import det_exp_py, det_ln_py

    total, n = 0, 0
    for val in v:
        if val is None or pd.isna(val) or val <= 0:
            continue
        lnx = det_ln_py(float(val))
        x9 = lnx * 1000000000
        total += (
            math.floor(x9 + 0.5) if x9 >= 0 else -math.floor(-x9 + 0.5)
        )
        n += 1
    if n == 0:
        return None
    return det_exp_py(float(total) / (n * 1000000000.0))
