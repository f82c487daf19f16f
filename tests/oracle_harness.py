"""DuckDB differential harness — local replica of the driver's t2 gate.

For every registry entry with an oracle: run the Spark query and the
DuckDB SQL on the same parquet, then compare row count, column names,
dtype families, and order-insensitive values (floats to 1e-9 after
both sides' explicit rounding; everything else exact).

Usable as a library (pytest) and as a script:
    python tests/oracle_harness.py [--sf DIR] [--strict] [--vanilla] [query ...]

--strict adds the driver-faithful repr compare (signed zeros, Decimal
vs float, int vs float) on top of the tolerance compare.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bio_lakehouse_spark.suite.registry import TABLES

DEFAULT_SF = "/root/testdata/sf0.01"


def run_sf(sf_dir: str) -> float:
    """Scale factor parsed from the fixture dir name (``.../sf0.001``
    → 0.001). Unrecognized names are treated as the driver's sf0.01
    so the vacuity gate stays ON for custom fixture paths."""
    import re

    m = re.search(r"sf([0-9]*\.?[0-9]+)/?$", str(sf_dir))
    return float(m.group(1)) if m else 0.01


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.isoformat() if hasattr(v, "isoformat") else v
            )
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64") if df[c].isna().any() else df[c].astype("int64")
    sort_cols = list(df.columns)
    return df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)


def _dtype_family(s: pd.Series) -> str:
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if s.dtype == object:
        # Spark DecimalType arrives in pandas as object-dtype
        # decimal.Decimal cells. The r07 entity_resolution_fs red was
        # exactly a Decimal-vs-float split (driver repr-hashes
        # Decimal('5.441180') vs 5.44118) that the old "other" family
        # exempted from the family gate.
        import decimal

        for v in s:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                continue
            if isinstance(v, decimal.Decimal):
                return "decimal"
            break
    return "other"


def _repr_cell(v) -> str:
    """The driver's value-hash token for one cell: the post-round
    repr, signed zeros and Decimal trailing zeros included. Dates and
    midnight timestamps normalize to the same ISO day string — the
    driver treats Spark DATE ≡ DuckDB DATE even when pandas
    materializes one side as datetime64 (msprt_sequential_daily is
    driver-green with exactly that split)."""
    if v is None:
        return "null"
    if isinstance(v, str):
        # _canon already isoformats object-dtype dates to plain
        # strings; compare string content, not its quoted repr, so
        # those meet the Timestamp normalization below.
        return v
    try:
        if pd.isna(v):  # NaN, NaT, pd.NA — all one null token, like
            return "null"  # the driver (safe_cast_mixed_dates is
    except (TypeError, ValueError):  # green with None vs NaT)
        pass
    if hasattr(v, "isoformat"):
        iso = v.isoformat()
        return iso[:10] if iso[10:] in ("", "T00:00:00") else iso
    return repr(v)


def compare(
    spark_df: pd.DataFrame, oracle_df: pd.DataFrame, strict: bool = False
) -> list[str]:
    """Return a list of mismatch descriptions (empty → pass).

    strict=True adds the driver-faithful repr compare: every cell's
    repr must match EXACTLY (so 0.0 vs -0.0, Decimal vs float, and
    last-ulp float differences that survive the query's own rounding
    all fail here instead of in CORRECTNESS_r{N}.json)."""
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
        return problems
    # Driver-faithful dtype gate: the driver hashes value reprs, so an
    # int64 Spark column vs a float64 oracle column (`5` vs `5.0`)
    # hash-mismatches even when values are bit-identical. The six r04
    # red rows were exactly this (DuckDB SUM → HUGEINT → float64).
    # Fail on int-vs-float family splits instead of coercing.
    for c in sorted(spark_df.columns):
        sf, of = _dtype_family(spark_df[c]), _dtype_family(oracle_df[c])
        # Any numeric/bool family split reprs differently in the
        # driver's value hash (5 vs 5.0, True vs 1) even when values
        # are bit-identical — flag them all, not just int-vs-float.
        if sf != of and {sf, of} <= {"bool", "int", "float", "decimal"}:
            problems.append(
                f"column {c}: dtype family mismatch spark={sf} oracle={of} "
                f"(driver hashes 5/5.0/True/Decimal('5.0') differently — "
                f"CAST whichever side is wrong)"
            )
    if problems:
        return problems
    s, o = _canon(spark_df), _canon(oracle_df)
    for c in s.columns:
        sc, oc = s[c], o[c]
        if pd.api.types.is_float_dtype(sc) or pd.api.types.is_float_dtype(oc):
            sc = pd.to_numeric(sc, errors="coerce").astype(float)
            oc = pd.to_numeric(oc, errors="coerce").astype(float)
            bad = 0
            for a, b in zip(sc, oc):
                if (isinstance(a, float) and math.isnan(a)) and (
                    isinstance(b, float) and math.isnan(b)
                ):
                    continue
                if a is None and b is None:
                    continue
                if a is None or b is None or math.isnan(a) != math.isnan(b):
                    bad += 1
                elif abs(a - b) > 1e-9 * max(1.0, abs(a), abs(b)):
                    bad += 1
            if bad:
                problems.append(f"column {c}: {bad} float mismatches")
        else:
            neq = ~(
                (sc == oc) | (sc.isna() & oc.isna())
            )
            if neq.any():
                idx = neq.idxmax()
                problems.append(
                    f"column {c}: {int(neq.sum())} mismatches "
                    f"(first at row {idx}: spark={sc[idx]!r} oracle={oc[idx]!r})"
                )
    if strict and not problems:
        # Driver-faithful repr pass: the driver hashes value reprs, so
        # anything that reprs differently — 0.0 vs -0.0, Decimal vs
        # float, 5 vs 5.0 — is a red there even when numerically equal.
        for c in s.columns:
            bad = first = None
            n_bad = 0
            for i, (a, b) in enumerate(zip(s[c], o[c])):
                ra, rb = _repr_cell(a), _repr_cell(b)
                if ra != rb:
                    n_bad += 1
                    if first is None:
                        first = (i, ra, rb)
            if n_bad:
                i, ra, rb = first
                problems.append(
                    f"column {c}: {n_bad} STRICT repr mismatches (driver "
                    f"hash red; first at row {i}: spark={ra} oracle={rb})"
                )
    return problems


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = DEFAULT_SF
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    strict = "--strict" in args
    if strict:
        args.remove("--strict")

    from bio_lakehouse_spark.suite import REGISTRY

    if vanilla:
        # Driver-faithful mode: a DEFAULT SparkSession with NONE of the
        # session-factory confs, exactly like the driver's own session.
        # Any query whose value-hash contract silently depends on a
        # factory conf (partition-type inference, timezone, nanos
        # handling) fails HERE instead of in CORRECTNESS_r{N}.json.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("oracle-harness-vanilla")
            .master("local[8]")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "12g")
            .getOrCreate()
        )
    else:
        from bio_lakehouse_spark.session import get_spark

        spark = get_spark("oracle-harness", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    names = args or list(REGISTRY)
    failed = []
    for name in names:
        spec = REGISTRY[name]
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if spec.oracle is None:
            print(f"ok   {name} (rows-only: {len(sdf)} rows)")
            continue
        try:
            odf = run_oracle(spec.oracle, sf_dir)
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: oracle error: {e}")
            continue
        problems = compare(sdf, odf, strict=strict)
        # Vacuity gate (VERDICT r6 #2): a 0-row match on a query whose
        # fixture guarantees data certifies nothing — the predicate
        # missed the testdata entirely. The guarantee is SF-scoped
        # (expect_rows_min_sf): selective predicates can be rightly
        # empty at sf0.001 while guaranteed at the driver's sf0.01.
        if (
            not problems
            and spec.expect_rows
            and run_sf(sf_dir) >= spec.expect_rows_min_sf
            and len(sdf) == 0
        ):
            problems = [
                "vacuous green: 0 rows but expect_rows=True "
                "(predicate matches no fixture data)"
            ]
        if problems:
            failed.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"pass {name} ({len(sdf)} rows)")
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
