"""Self-check of the driver contract: run each queries() entry and its
oracle_sql() side-by-side over a testdata sf dir, compare row count, column
names, and (sorted) values with allclose.

--strict additionally emulates the driver's value-hash gate: for every float
column it reports max-abs drift, the bit-exact fraction, and the number of
rows whose value would ROUND differently from the oracle at 6..9 decimal
places (the driver's hash granularity is in that family — measured round 3:
queries that passed the r02 hash exclude finer granularities). A query FAILS
strict mode if any rounding family has a crossing, i.e. exactly when the
driver's hash could flip. Round 2 shipped a red oracle because the default
rtol=1e-9 check here was looser than the driver's hash — strict mode closes
that gap.

Usage: python scripts/check_contract.py [--strict] [sf_dir] [query ...]
"""

import sys

import duckdb
import numpy as np
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")

STRICT = False


def to_pandas(res) -> pd.DataFrame:
    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    import pyarrow as pa

    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, ours: pd.DataFrame, ref: pd.DataFrame) -> list[str]:
    problems = []
    if set(ours.columns) != set(ref.columns):
        problems.append(f"schema mismatch: {set(ours.columns) ^ set(ref.columns)}")
        return problems
    if len(ours) != len(ref):
        problems.append(f"row count {len(ours)} vs {len(ref)}")
        return problems
    if STRICT:
        # The driver's value hash is dtype-sensitive: an int32 column that
        # comes back float64 (e.g. through a null-padded pandas conversion)
        # hash-mismatches even when every value is numerically equal. canon()
        # below erases that distinction, so check dtype FAMILY first.
        for c in ours.columns:
            fa = pd.api.types.is_float_dtype(ours[c])
            fb = pd.api.types.is_float_dtype(ref[c])
            ia = pd.api.types.is_integer_dtype(ours[c])
            ib = pd.api.types.is_integer_dtype(ref[c])
            if fa != fb or ia != ib:
                problems.append(
                    f"{c}: dtype family mismatch (ours={ours[c].dtype}, "
                    f"oracle={ref[c].dtype}) — driver hash would flip"
                )
    a, b = canon(ours), canon(ref)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            if not np.allclose(a[c], b[c], equal_nan=True, rtol=1e-9, atol=1e-12):
                bad = np.nanmax(np.abs(a[c].to_numpy() - b[c].to_numpy()))
                problems.append(f"values differ in {c} (max abs {bad})")
            elif STRICT:
                problems.extend(strict_float_check(name, c, a[c], b[c]))
        else:
            if not (a[c].astype(str).to_numpy() == b[c].astype(str).to_numpy()).all():
                problems.append(f"values differ in {c}")
    return problems


def strict_float_check(name, col, av, bv) -> list[str]:
    """Emulate the driver hash: any rounding crossing at 6..9 decimals fails."""
    a, b = av.to_numpy(), bv.to_numpy()
    nan_a, nan_b = np.isnan(a), np.isnan(b)
    if (nan_a != nan_b).any():
        return [f"{col}: NaN-mask mismatch in strict mode"]
    m = ~nan_a
    if not m.any():
        return []
    a, b = a[m], b[m]
    drift = float(np.max(np.abs(a - b))) if len(a) else 0.0
    exact = float(np.mean(a == b))
    crossings = {
        d: int(np.sum(np.round(a, d) != np.round(b, d))) for d in (6, 7, 8, 9)
    }
    worst = max(crossings.values())
    if worst or drift > 0:
        print(
            f"    [strict] {name}.{col}: maxabs={drift:.3e} "
            f"bitexact={exact:.3f} round-crossings={crossings}"
        )
    if worst:
        return [f"{col}: {worst} hash-rounding crossings {crossings}"]
    return []


def main():
    global STRICT
    args = sys.argv[1:]
    if "--strict" in args:
        STRICT = True
        args.remove("--strict")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"[FAIL] {name}: ray side raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(ours)} rows, {dt:.1f}s")
            n_ok += 1
            continue
        try:
            ref = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        problems = compare(name, ours, ref)
        if problems:
            print(f"[FAIL] {name}: " + "; ".join(problems))
            n_bad += 1
        else:
            print(f"[ok] {name}: {len(ours)} rows match, {dt:.1f}s")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
