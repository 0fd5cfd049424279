"""DuckDB-oracle comparison harness mirroring the driver's protocol:
run the Spark query and the oracle SQL on the same parquet, sort columns
by name, canonical-sort rows, round floats, compare.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd

from mapreduce_framework_simple_spark.sources.io import TABLES

FLOAT_DECIMALS = 4


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canonicalize(df: pd.DataFrame, round_floats: bool = True) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
            if round_floats:
                df[c] = df[c].round(FLOAT_DECIMALS)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif s.dtype == object:
            # decimals / HUGEINT etc. arrive as objects; normalize numerics
            # — but only round them under the legacy tolerance: in strict
            # mode a 4-dp rounding here would mask exactly the driver-hash
            # drift strict mode exists to catch
            def norm(v):
                if round_floats and isinstance(v, float):
                    return round(v, FLOAT_DECIMALS)
                return v
            df[c] = s.map(norm)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare_frames(
    spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, strict: bool = True
) -> list[str]:
    """Return a list of mismatch descriptions (empty == match).

    strict=True mirrors the driver's canonical value-hash protocol:
    - float columns must be EXACTLY equal (the driver hashes full-precision
      values, so a 1-ULP libm difference — e.g. Spark vs DuckDB ln() — is a
      hash fail; oracles must round transcendentals in BOTH engines);
    - dtype *kind* must agree between the Spark result and the DuckDB
      oracle (DuckDB returns HUGEINT for integer sum() which surfaces as
      float/object, and DOUBLE for floor(); either hashes differently from
      Spark's bigint even when every value is numerically equal — oracles
      must CAST).
    strict=False keeps the legacy 4-dp tolerance for sketch/approx checks.
    """
    problems: list[str] = []
    a = canonicalize(spark_pdf, round_floats=not strict)
    b = canonicalize(duck_pdf, round_floats=not strict)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} duck={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row counts differ: spark={len(a)} duck={len(b)}"]
    if strict:
        for c in a.columns:
            ak, bk = a[c].dtype.kind, b[c].dtype.kind
            if ak != bk:
                problems.append(
                    f"col {c}: dtype drift spark={a[c].dtype} duck={b[c].dtype} "
                    "(driver canonical hash would differ — CAST in the oracle)"
                )
        if problems:
            return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = av.astype("float64")
            bf = bv.astype("float64")
            both_nan = af.isna() & bf.isna()
            if strict:
                close = both_nan | (af == bf)
            else:
                close = both_nan | (
                    (af - bf).abs()
                    <= 10.0 ** (-FLOAT_DECIMALS) + 1e-9 * bf.abs().fillna(0.0)
                )
            if not close.all():
                i = int((~close).idxmax())
                problems.append(f"col {c}: row {i}: spark={af[i]!r} duck={bf[i]!r}")
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                problems.append(f"col {c}: row {i}: spark={av[i]!r} duck={bv[i]!r}")
    return problems

