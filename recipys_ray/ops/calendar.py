"""Calendar feature extraction — per-row datetime decomposition.

The standard temporal feature-engineering block for behavioral / transcript
tables: year, month, day, ISO week, hour, day-of-week and an is-weekend
flag, stamped per row from a timestamp column. Fully stateless and
embarrassingly parallel — ONE ``map_batches`` of pyarrow.compute temporal
kernels over zero-copy Arrow batches, no shuffle, no fit pass; at 100 TB
this stage streams at read bandwidth.

Engine-parity notes (tests + SQL oracle pin these):
- day-of-week follows the SQL convention (DuckDB ``dayofweek``):
  Sunday = 0 … Saturday = 6 — Arrow's kernel with ``week_start=7`` +
  ``count_from_zero=True``.
- week is the ISO week number (DuckDB ``week`` ≡ Arrow ``iso_week``).
- All outputs are int64 (the driver value hash is dtype-sensitive; SQL
  ``extract``/part functions return BIGINT).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_I64 = pa.int64()


def calendar_features(ds, ts_col: str, weekend_days: tuple[int, int] = (0, 6)):
    """Append ``year month day week hour dow is_weekend`` int64 columns
    derived from ``ts_col``. ``weekend_days`` are in the Sunday=0
    convention (default Sunday + Saturday)."""
    wknd = frozenset(int(d) for d in weekend_days)

    def stamp(tbl: pa.Table) -> pa.Table:
        ts = tbl.column(ts_col)
        # Sunday=0 convention directly: week_start=7 (Sunday) + count_from_zero
        dow = pc.day_of_week(ts, count_from_zero=True, week_start=7)
        is_weekend = pc.cast(
            pc.is_in(dow, value_set=pa.array(sorted(wknd))), _I64
        )
        cols = {
            "year": pc.cast(pc.year(ts), _I64),
            "month": pc.cast(pc.month(ts), _I64),
            "day": pc.cast(pc.day(ts), _I64),
            "week": pc.cast(pc.iso_week(ts), _I64),
            "hour": pc.cast(pc.hour(ts), _I64),
            "dow": pc.cast(dow, _I64),
            "is_weekend": is_weekend,
        }
        for name, arr in cols.items():
            tbl = tbl.append_column(name, arr)
        return tbl

    return ds.map_batches(stamp, batch_format="pyarrow")
