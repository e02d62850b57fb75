"""operators/ml.py — integer-exact logistic regression. The contract is
bit-for-bit determinism of the fitted weights under ANY partitioning /
aggregation order (every cross-row reduction is an exact integer sum),
plus agreement with an independent pure-Python reference loop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from muninn_avro_to_parquet_spark.operators import ml


def _tdiv_ref(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


def _fit_ref(rows, d, iterations, lr_num, lr_den, scale=1_000_000):
    """Independent reference: plain python loop over collected rows, same
    rational sigmoid, same integer quantization. Spark's round(double)
    is HALF_UP (away from zero); python's round() is half-even, so the
    tie case is handled explicitly."""
    import math

    def round_half_up(x: float) -> int:
        return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))

    w = [0] * (d + 1)
    for _ in range(iterations):
        n = 0
        g = [0] * (d + 1)
        for r in rows:
            xs, label = r[:d], r[d]
            m_s = w[0] + sum(w[i + 1] * xs[i] for i in range(d))
            m = m_s / float(scale)
            p = 0.5 + m / (2.0 * (1.0 + abs(m)))
            resid = round_half_up(p * scale) - label * scale
            n += 1
            g[0] += resid
            for i in range(d):
                g[i + 1] += resid * xs[i]
        w = [w[i] - _tdiv_ref(lr_num * g[i], lr_den * n) for i in range(d + 1)]
    return w, n


def test_tdiv_matches_sql_div_semantics(spark):
    cases = [(7, 2), (-7, 2), (7, -2), (-7, -2), (0, 3), (5, 5), (-1, 4)]
    got = [ml._tdiv(a, b) for a, b in cases]
    expected = [
        spark.sql(f"SELECT CAST({a} AS BIGINT) div CAST({b} AS BIGINT)").collect()[0][0]
        for a, b in cases
    ]
    assert got == expected


def test_fast_sigmoid_shape(spark):
    df = spark.range(1).select(
        *[ml.fast_sigmoid(F.lit(float(m))).alias(f"s{i}") for i, m in enumerate([-100.0, -1.0, 0.0, 1.0, 100.0])]
    )
    s = df.collect()[0]
    vals = [s[i] for i in range(5)]
    assert vals[2] == 0.5
    assert all(0.0 < v < 1.0 for v in vals)
    assert vals == sorted(vals)  # strictly increasing
    assert vals[0] < 0.01 and vals[4] > 0.99


@pytest.fixture(scope="module")
def _toy(spark):
    """Linearly separable-ish integer features with both signs."""
    import random

    rng = random.Random(7)
    rows = []
    for _ in range(400):
        x1 = rng.randint(-25, 25)
        x2 = rng.randint(0, 40)
        x3 = rng.randint(0, 40)
        label = 1 if (3 * x1 - x2 + 2 * x3 + rng.randint(-20, 20)) > 0 else 0
        rows.append((x1, x2, x3, label))
    return rows


def test_fit_matches_pure_python_reference(spark, _toy):
    df = spark.createDataFrame(_toy, "x1 int, x2 int, x3 int, label int")
    model = ml.logreg_fit(df, ["x1", "x2", "x3"], "label", iterations=3)
    ref_w, ref_n = _fit_ref(_toy, 3, 3, lr_num=5, lr_den=1)
    assert model.weights == ref_w
    assert model.n_rows == ref_n == 400


def test_fit_invariant_under_partitioning(spark, _toy):
    df = spark.createDataFrame(_toy, "x1 int, x2 int, x3 int, label int")
    base = ml.logreg_fit(df, ["x1", "x2", "x3"], "label", iterations=2)
    for parts in (1, 7, 32):
        again = ml.logreg_fit(
            df.repartition(parts), ["x1", "x2", "x3"], "label", iterations=2
        )
        assert again.weights == base.weights, parts


def test_score_threshold_and_report(spark, _toy):
    df = spark.createDataFrame(_toy, "x1 int, x2 int, x3 int, label int")
    model = ml.logreg_fit(df, ["x1", "x2", "x3"], "label", iterations=3)
    scored = ml.logreg_score(df, model, ["x1", "x2", "x3"])
    rows = scored.collect()
    for r in rows:
        assert r["prediction"] == (1 if r["margin_scaled"] > 0 else 0)
        assert 0.0 < r["probability"] < 1.0
    report = ml.logreg_training_report(df, ["x1", "x2", "x3"], "label", iterations=3)
    rep = {r["name"]: r["value"] for r in report.collect()}
    assert [rep[f"w{i}"] for i in range(4)] == model.weights
    assert rep["n_rows"] == 400
    n_correct = sum(1 for r in rows if r["prediction"] == r["label"])
    assert rep["n_correct"] == n_correct
    # the learner beats the majority-class baseline on a learnable signal
    majority = max(n for n in (sum(1 for t in _toy if t[3] == 1),
                               sum(1 for t in _toy if t[3] == 0)))
    assert n_correct > majority


def test_gradient_sums_accumulate_in_decimal38(spark):
    """The docstring bound: rows · scale · max|x| beyond 2^63 must not
    overflow — the sums are DECIMAL(38,0). 2k rows of |x| = 10^13 with
    scale 10^6 pushes each gradient sum past 10^22 (BIGINT dies at
    9.2·10^18)."""
    big = 10_000_000_000_000  # 10^13
    df = spark.range(2000).select(
        F.lit(big).alias("x1"), (F.col("id") % 2).cast("int").alias("label")
    )
    model = ml.logreg_fit(df, ["x1"], "label", iterations=1)
    rows = [(big, int(i % 2)) for i in range(2000)]
    ref_w, _ = _fit_ref(rows, 1, 1, lr_num=5, lr_den=1)
    assert model.weights == ref_w


# ---------------------------------------------------------------------------
# linear regression (closed-form OLS, r9)
# ---------------------------------------------------------------------------


def test_linreg_matches_exact_rational_reference(spark):
    """linreg_fit vs a pure-Python exact solve of the same normal
    equations (Fraction Cramer) — including the trunc-toward-zero
    scaling contract — and a sanity check against the data-generating
    line."""
    from fractions import Fraction

    from muninn_avro_to_parquet_spark.operators import ml

    # y = 3 + 2*x1 - x2 + deterministic integer "noise" in {-1,0,1}
    rows = [
        (x1, x2, 3 + 2 * x1 - x2 + ((x1 * 7 + x2 * 5) % 3 - 1))
        for x1 in range(12)
        for x2 in range(9)
    ]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long").repartition(7)
    model = ml.linreg_fit(df, ["x1", "x2"], "y", scale=10_000)

    # reference: exact rational Cramer over plain-python sums
    n = len(rows)
    s1 = sum(r[0] for r in rows); s2 = sum(r[1] for r in rows)
    s11 = sum(r[0] * r[0] for r in rows); s12 = sum(r[0] * r[1] for r in rows)
    s22 = sum(r[1] * r[1] for r in rows)
    sy = sum(r[2] for r in rows)
    s1y = sum(r[0] * r[2] for r in rows); s2y = sum(r[1] * r[2] for r in rows)
    det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
    det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)
    det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)
    det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)
    want = [
        ml._tdiv(10_000 * d_, det) for d_ in (det0, det1, det2)
    ]
    assert model.weights_scaled == want
    assert model.n_rows == n
    # the fit must land near the generating line (noise is tiny)
    w = [Fraction(v, 10_000) for v in model.weights_scaled]
    assert abs(w[0] - 3) < 1 and abs(w[1] - 2) < Fraction(1, 4) and abs(w[2] + 1) < Fraction(1, 4)


def test_linreg_partitioning_invariant_and_report(spark):
    from muninn_avro_to_parquet_spark.operators import ml

    rows = [(x, 5 * x + 7) for x in range(50)]
    a = spark.createDataFrame(rows, "x long, y long")
    m1 = ml.linreg_fit(a.coalesce(1), ["x"], "y")
    m2 = ml.linreg_fit(a.repartition(13), ["x"], "y")
    assert m1.weights_scaled == m2.weights_scaled == [70_000, 50_000]  # exact line
    rep = {
        r["name"]: r["value"]
        for r in ml.linreg_training_report(a, ["x"], "y").collect()
    }
    assert rep["w0"] == 70_000 and rep["w1"] == 50_000
    assert rep["n_rows"] == 50 and rep["abs_err_scaled_sum"] == 0  # perfect fit


def test_linreg_singular_raises(spark):
    import pytest

    from muninn_avro_to_parquet_spark.operators import ml

    # x2 = 2*x1 → collinear with x1 (and the intercept handles shift)
    df = spark.createDataFrame(
        [(i, 2 * i, i + 1) for i in range(10)], "x1 long, x2 long, y long"
    )
    with pytest.raises(ValueError, match="singular"):
        ml.linreg_fit(df, ["x1", "x2"], "y")


# ---------------------------------------------------------------------------
# k-means (integer-exact Lloyd, r9)
# ---------------------------------------------------------------------------


def _lloyd_reference(points, k, iterations):
    """Pure-python mirror of the kmeans_fit contract."""
    from muninn_avro_to_parquet_spark.operators.ml import _tdiv

    cents = sorted(set(points))[:k]
    for _ in range(iterations):
        groups = {}
        for p in points:
            j = min(
                range(len(cents)),
                key=lambda j: (
                    sum((a - b) ** 2 for a, b in zip(p, cents[j])),
                    j,
                ),
            )
            groups.setdefault(j, []).append(p)
        cents = [
            tuple(
                _tdiv(sum(p[i] for p in groups[j]), len(groups[j]))
                for i in range(len(cents[j]))
            )
            if j in groups
            else cents[j]
            for j in range(len(cents))
        ]
    inertia = sum(
        min(sum((a - b) ** 2 for a, b in zip(p, c)) for c in cents)
        for p in points
    )
    return cents, inertia


def test_kmeans_matches_pure_python_reference(spark):
    from muninn_avro_to_parquet_spark.operators import ml

    pts = [
        ((i * 37) % 20, (i * 53) % 17) for i in range(200)
    ] + [(100 + (i % 5), 90 + (i % 3)) for i in range(60)]
    df = spark.createDataFrame(pts, "x1 long, x2 long").repartition(9)
    model = ml.kmeans_fit(df, ["x1", "x2"], k=4, iterations=3)
    want_c, want_i = _lloyd_reference(pts, 4, 3)
    assert model.centroids == want_c
    assert model.inertia == want_i
    assert model.n_rows == len(pts)
    # partitioning invariance
    model2 = ml.kmeans_fit(df.coalesce(1), ["x1", "x2"], k=4, iterations=3)
    assert model2.centroids == model.centroids


def test_kmeans_empty_cluster_keeps_centroid(spark):
    from muninn_avro_to_parquet_spark.operators import ml

    # three distinct tuples seed three centroids, but every point sits on
    # top of the first two: centroid 2 gets no members and must survive
    pts = [(0, 0)] * 10 + [(10, 10)] * 10 + [(100, 100)]
    df = spark.createDataFrame(pts, "x1 long, x2 long")
    model = ml.kmeans_fit(df, ["x1", "x2"], k=3, iterations=2)
    assert model.centroids[2] == (100, 100)
    rep = {
        r["name"]: r["value"]
        for r in ml.kmeans_training_report(df, ["x1", "x2"], k=3, iterations=2).collect()
    }
    assert rep["c2_x1"] == 100 and rep["n_rows"] == 21


def test_kmeans_too_few_distinct_raises(spark):
    import pytest

    from muninn_avro_to_parquet_spark.operators import ml

    df = spark.createDataFrame([(1, 1)] * 5 + [(2, 2)] * 5, "x1 long, x2 long")
    with pytest.raises(ValueError, match="distinct"):
        ml.kmeans_fit(df, ["x1", "x2"], k=3)


def test_naive_bayes_separable_corpus(spark):
    """On a class-separable corpus the held-out docs must classify to
    their true class; scores are integer micro-nats and reruns are
    bit-identical."""
    from pyspark.sql import functions as F

    from muninn_avro_to_parquet_spark.operators import ml

    rows = []
    for i in range(40):
        lab = "cat" if i % 2 == 0 else "dog"
        word = "meow purr whiskers" if lab == "cat" else "woof bark fetch"
        rows.append((i, lab, f"{word} the the a {word}"))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = ml.naive_bayes_classify(docs, F.col("doc_id") >= 8)
    got = {(r["doc_id"], r["lang"], r["predicted"]) for r in out.collect()}
    assert len(got) == 8  # doc_id 0..7 held out
    assert all(actual == pred for _, actual, pred in got)
    again = {
        (r["doc_id"], r["lang"], r["predicted"], r["score_micro"])
        for r in ml.naive_bayes_classify(docs, F.col("doc_id") >= 8).collect()
    }
    assert again == {
        (r["doc_id"], r["lang"], r["predicted"], r["score_micro"])
        for r in out.collect()
    }


def test_naive_bayes_null_train_pred_is_held_out(spark):
    """A row where train_pred evaluates to NULL must be CLASSIFIED
    (treated as held-out), not silently dropped from both splits
    (ADVICE r12: filter(pred) and filter(~pred) both drop NULLs)."""
    from pyspark.sql import functions as F

    from muninn_avro_to_parquet_spark.operators import ml

    rows = [
        (i, "cat" if i % 2 == 0 else "dog",
         "meow purr" if i % 2 == 0 else "woof bark", i % 2 == 0)
        for i in range(4, 30)
    ]
    # flag=NULL rows: must land in the held-out split
    rows += [(0, "cat", "meow purr", None), (1, "dog", "woof bark", None)]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, text string, flag boolean"
    )
    out = {r["doc_id"]: r["predicted"] for r in ml.naive_bayes_classify(
        docs, F.when(F.col("doc_id") >= 4, True).otherwise(F.col("flag"))
    ).collect()}
    assert set(out) == {0, 1}
    assert out[0] == "cat" and out[1] == "dog"


def test_naive_bayes_tokenless_doc_gets_prior_argmax(spark):
    """A held-out doc with empty/NULL text must still get a row — the
    prior-only argmax — not silently vanish (r12 review)."""
    from pyspark.sql import functions as F

    from muninn_avro_to_parquet_spark.operators import ml

    rows = [(i, "big" if i % 3 else "small", "word" + str(i % 4)) for i in range(9, 30)]
    rows += [(0, "small", ""), (1, "big", None), (2, "big", "word1")]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["doc_id"]: r for r in ml.naive_bayes_classify(
        docs, F.col("doc_id") >= 3
    ).collect()}
    assert set(out) == {0, 1, 2}
    # 'big' has the larger training prior (14 of 21 docs)
    assert out[0]["predicted"] == "big" and out[1]["predicted"] == "big"
