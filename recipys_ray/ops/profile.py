"""One-pass dataset profiling — the ``describe()`` a user reaches for
before building a pipeline over new data.

``profile(ds)`` returns one row per column with row/null counts, moments,
min/max and (approximate above the exact-cardinality threshold) quantiles,
all from ONE streaming partial-aggregate pass (aggregates.column_stats: a
tiny partial per input block, merged on the driver — no shuffle, no
materialization). Non-numeric columns report dtype only.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from recipys_ray.aggregates import MINMAX, MOMENTS, QUANTILES, column_stats


def profile(
    ds,
    columns: Optional[list] = None,
    quantiles=(0.25, 0.5, 0.75),
) -> pd.DataFrame:
    """Per-column summary statistics in one streaming pass."""
    import pyarrow as pa

    schema = ds.schema()
    names = list(schema.names)
    types = dict(zip(schema.names, schema.types))
    if columns is not None:
        names = [c for c in names if c in set(columns)]

    def _is_num(t) -> bool:
        try:
            return pa.types.is_integer(t) or pa.types.is_floating(t)
        except AttributeError:
            # pandas-block datasets expose numpy dtypes
            return np.issubdtype(t, np.number)

    numeric = [c for c in names if _is_num(types[c])]
    stats = column_stats(ds, numeric, {MOMENTS, MINMAX, QUANTILES})
    rows = []
    for c in names:
        rec = {"column": c, "dtype": str(types[c])}
        if c in stats:
            s = stats[c]
            rec.update(
                rows_total=s.total,
                nulls=s.n_null,
                mean=s.mean(),
                std=s.std(ddof=0),
                min=s.min,
                max=s.max,
            )
            for q in quantiles:
                rec[f"q{q}"] = (
                    float(np.asarray(s.quantile(q))[0]) if s.count else None
                )
        rows.append(rec)
    return pd.DataFrame(rows)
