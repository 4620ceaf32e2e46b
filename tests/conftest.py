import numpy as np
import pandas as pd
import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from mircv_project_spark.session import get_spark

    s = get_spark("mircv-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    """Run oracle SQL the way the driver does: tables registered as views."""
    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def assert_frames_match(spark_df, duck_df: pd.DataFrame, float_tol: float = 0.0):
    """Order-insensitive comparison mirroring the driver's check:
    same row count, same column names/types (loosely), same values."""
    sp = spark_df.toPandas()
    assert sorted(sp.columns) == sorted(duck_df.columns), (
        sp.columns, duck_df.columns
    )
    sp = sp[sorted(sp.columns)]
    dk = duck_df[sorted(duck_df.columns)]
    assert len(sp) == len(dk), f"row count {len(sp)} != {len(dk)}"
    sort_cols = list(sp.columns)
    sp = sp.sort_values(sort_cols, ignore_index=True)
    dk = dk.sort_values(sort_cols, ignore_index=True)
    for c in sp.columns:
        a, b = sp[c], dk[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            if float_tol:
                ok = np.allclose(
                    a.astype(float), b.astype(float), atol=float_tol, equal_nan=True
                )
            else:
                ok = (a.astype(float).values == b.astype(float).values) | (
                    a.isna().values & b.isna().values
                )
                ok = ok.all()
            assert ok, f"column {c} differs:\n{a[a.ne(b)].head()}\n{b[b.ne(a)].head()}"
        else:
            pd.testing.assert_series_equal(
                a, b, check_dtype=False, check_names=False, obj=c
            )
