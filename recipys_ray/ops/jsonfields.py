"""Vectorized extraction of scalar fields from flat-JSON string columns.

Event/metadata tables routinely carry a JSON `props` column; pulling one
scalar field out of every row must not mean a Python ``json.loads`` per
row. For FLAT objects a field access is a regular language, so the fast
path is one Arrow RE2 ``extract_regex`` kernel over the batch — the same
engine DuckDB's ``regexp_extract`` uses, which keeps the oracle exact.
For nested/escaped JSON use a json.loads actor stage instead (this module
is explicitly the flat fast path and says so)."""

from __future__ import annotations

import pyarrow as pa


def extract_json_int(
    ds,
    col: str,
    field: str,
    out_col: str | None = None,
    batch_size: int = 8192,
):
    """Extract integer ``field`` from flat-JSON strings in ``col`` into
    ``out_col`` (default ``<field>_val``, int64; null when the field is
    absent or the row is null)."""
    out_col = out_col or f"{field}_val"
    pattern = rf'"{field}":\s*(?P<v>-?\d+)'

    def fn(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.extract_regex(tbl.column(col), pattern=pattern)
        vals = pc.struct_field(m, "v").cast(pa.int64())
        return tbl.append_column(out_col, vals)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
