"""Data profiling + robust outliers (operators/profile.py, r13)."""

from __future__ import annotations

import pytest

from muninn_avro_to_parquet_spark.operators import profile


def test_profile_counts_modes_and_all_null_column(spark):
    df = spark.createDataFrame(
        [
            (1, "a", None),
            (2, "b", None),
            (2, "b", None),
            (10, None, None),
        ],
        "k long, s string, z string",
    )
    rows = {r["column"]: r for r in profile.profile(df).collect()}
    assert set(rows) == {"k", "s", "z"}
    k = rows["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 0, 3)
    # native-order min/max (NOT lexicographic: '10' < '2' as strings)
    assert (k["min_value"], k["max_value"]) == ("1", "10")
    assert (k["top_value"], k["top_count"]) == ("2", 2)
    s = rows["s"]
    assert (s["n_nulls"], s["n_distinct"], s["top_value"], s["top_count"]) == (
        1, 2, "b", 2,
    )
    z = rows["z"]
    assert (z["n_nulls"], z["n_distinct"], z["top_value"], z["top_count"]) == (
        4, 0, None, 0,
    )
    with pytest.raises(ValueError, match="no such columns"):
        profile.profile(df, ["nope"])


def test_profile_mode_tiebreak_is_value_asc(spark):
    df = spark.createDataFrame([("b",), ("a",), ("a",), ("b",)], "s string")
    r = profile.profile(df, ["s"]).collect()[0]
    assert (r["top_value"], r["top_count"]) == ("a", 2)


def test_robust_outliers_flags_and_mad_zero_degenerate(spark):
    rows = [("g1", float(v)) for v in [10, 11, 9, 10, 12, 10, 1000]]
    rows += [("g2", 5.0)] * 6 + [("g2", 7.0)]  # mad 0: any deviation flags
    df = spark.createDataFrame(rows, "g string, x double")
    out = {
        r["g"]: r
        for r in profile.robust_outliers(df, "x", ["g"], k=5.0).collect()
    }
    g1 = out["g1"]
    assert g1["n_rows"] == 7 and g1["median"] == 10.0
    assert g1["n_outliers"] == 1  # the 1000
    g2 = out["g2"]
    assert g2["mad"] == 0.0 and g2["n_outliers"] == 1  # the lone 7.0
    with pytest.raises(ValueError, match="positive"):
        profile.robust_outliers(df, "x", ["g"], k=0)


def test_key_skew_integer_log2_buckets(spark):
    """Bucket b holds keys with count in [2^b, 2^(b+1)); counts are
    integer-exact via length(bin(cnt)) - 1; NULL keys excluded."""
    from muninn_avro_to_parquet_spark.operators import profile as prof

    rows = (
        [("a",)] * 1 + [("b",)] * 2 + [("c",)] * 3 + [("d",)] * 4
        + [("hot",)] * 9 + [(None,)] * 5
    )
    df = spark.createDataFrame(rows, "k string")
    got = {
        r["freq_bucket"]: (r["n_keys"], r["n_rows"], r["max_count"])
        for r in prof.key_skew(df, "k").collect()
    }
    assert got == {
        0: (1, 1, 1),       # a: count 1
        1: (2, 5, 3),       # b (2), c (3)
        2: (1, 4, 4),       # d (4)
        3: (1, 9, 9),       # hot (9)
    }


def test_profile_quantiles_one_sample_all_columns(spark):
    """profile_quantiles: per-column estimates from ONE md5 row draw —
    sample sizes reflect per-column nulls, estimates obey the rank law,
    and validation is loud."""
    from muninn_avro_to_parquet_spark.operators import profile as prof

    from pyspark.sql import functions as F

    rows = [
        (i, float(i), float(i * 10) if i % 5 else None) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "rid long, a double, b double")
    est = prof.profile_quantiles(df, ["a", "b"], "rid", k=64, quantiles_pct=(50, 95))
    got = {(r["column"], r["q_pct"]): r for r in est.collect()}
    assert got[("a", 50)]["n_sample"] == 64
    assert got[("b", 50)]["n_sample"] == 64  # 400 non-null rows > k
    # rank law at k=64: generous 20% bound, deterministic
    for (c, q), r in got.items():
        col = F.col(c)
        n = df.filter(col.isNotNull()).count()
        lt = df.filter(col.isNotNull() & (col < r["est"])).count()
        assert abs(1_000_000 * lt // n - q * 10_000) <= 200_000, (c, q)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        prof.profile_quantiles(df, [], "rid")
    with _pytest.raises(ValueError):
        prof.profile_quantiles(df, ["nope"], "rid")
