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
    inputs (they are excluded, matching ln semantics in SQL)."""
    import numpy as np

    x = v[v > 0]
    return float(np.exp(np.log(x).mean()))
