"""In-DataFrame iterative ML — the "you'd reach for MLlib" gap closed with
plain aggregates, arithmetic exact enough to hash-match a DuckDB oracle.

``logreg_fit``: batch gradient-descent logistic regression where every
cross-row reduction is an EXACT integer sum, so the result is
deterministic under any partitioning / aggregation order:

- features are caller-supplied INTEGER columns (quantize upstream, the
  ``similarity``/``text`` convention);
- weights live as scaled integers (``scale`` fixed-point);
- the margin and sigmoid run per-row in IEEE double (deterministic on
  every engine — no Σ of doubles ever happens), then the probability is
  re-quantized with ``round`` before the gradient sum;
- the sigmoid is the RATIONAL approximation ``0.5 + m/(2(1+|m|))``
  (Elliott / "fast sigmoid") — only +,*,/,abs, which IEEE pins
  bit-for-bit cross-engine, unlike ``exp`` whose last-ulp behavior is
  library-specific;
- weight updates divide with TRUNCATION toward zero, matching Spark's
  ``div`` and DuckDB's ``//`` (python ``//`` floors — ``_tdiv`` mirrors
  the SQL semantics).

Scale: one scan + one map-side-combinable aggregate per iteration; the
(d+1) weights ride into the plan as literals (no join, no driver-sized
state). Per-row gradient terms fit BIGINT (|resid| ≤ scale); the
cross-row sums accumulate in DECIMAL(38,0), so the global bound is
rows · scale · max|x| < 10^38 — comfortable at 10^12 rows, scale 10^6,
features to 10^19.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero (Spark ``div``, DuckDB
    ``//``); python's ``//`` floors, which disagrees for negative a."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


def fast_sigmoid(m: Column) -> Column:
    """0.5 + m / (2·(1+|m|)) — strictly increasing, bounded (0,1),
    crosses 0.5 at m=0; all-rational so cross-engine bit-exact."""
    return F.lit(0.5) + m / (F.lit(2.0) * (F.lit(1.0) + F.abs(m)))


@dataclass(frozen=True)
class LogRegModel:
    weights: list[int]  # scaled by `scale`; index 0 = bias
    scale: int
    iterations: int
    n_rows: int


def logreg_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iterations: int = 3,
    lr_num: int = 5,
    lr_den: int = 1,
    scale: int = 1_000_000,
) -> LogRegModel:
    """Fit by full-batch gradient descent; see module docstring for the
    determinism contract. ``label_col`` must be 0/1 integers; features
    integer columns. Learning rate = lr_num/lr_den applied to the MEAN
    gradient (the n divisor is folded into the update's truncating
    division, so no per-row float division happens)."""
    d = len(feature_cols)
    w = [0] * (d + 1)
    n_rows = 0
    for _ in range(iterations):
        m_s = F.lit(w[0]).cast("long")
        for i, c in enumerate(feature_cols):
            m_s = m_s + F.lit(w[i + 1]).cast("long") * F.col(c).cast("long")
        p = fast_sigmoid(m_s.cast("double") / F.lit(float(scale)))
        resid = F.round(p * scale).cast("long") - F.col(label_col).cast("long") * scale
        # per-row terms fit BIGINT (|resid| ≤ scale); the cross-row SUM is
        # the overflow risk, so it accumulates in DECIMAL(38,0) — exact to
        # 10^38, i.e. rows · scale · max|x| has 38 digits of headroom
        dec = "decimal(38,0)"
        aggs = [F.count(F.lit(1)).alias("n"), F.sum(resid.cast(dec)).alias("g0")]
        aggs += [
            F.sum((resid * F.col(c).cast("long")).cast(dec)).alias(f"g{i + 1}")
            for i, c in enumerate(feature_cols)
        ]
        row = df.agg(*aggs).collect()[0]
        n_rows = row["n"]
        w = [
            w[i] - _tdiv(lr_num * int(row[f"g{i}"]), lr_den * n_rows)
            for i in range(d + 1)
        ]
    return LogRegModel(weights=w, scale=scale, iterations=iterations, n_rows=n_rows)


def logreg_score(
    df: DataFrame,
    model: LogRegModel,
    feature_cols: list[str],
    prob_col: str = "probability",
) -> DataFrame:
    """Score rows with a fitted model: scaled margin, rational-sigmoid
    probability, and the 0.5-threshold prediction."""
    m_s = F.lit(model.weights[0]).cast("long")
    for i, c in enumerate(feature_cols):
        m_s = m_s + F.lit(model.weights[i + 1]).cast("long") * F.col(c).cast("long")
    p = fast_sigmoid(m_s.cast("double") / F.lit(float(model.scale)))
    return df.withColumn("margin_scaled", m_s).withColumn(prob_col, p).withColumn(
        "prediction", (m_s > 0).cast("int")
    )


def logreg_training_report(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iterations: int = 3,
    lr_num: int = 5,
    lr_den: int = 1,
    scale: int = 1_000_000,
) -> DataFrame:
    """Fit + evaluate in one call, returned as a RELATION so the result
    is oracle-hashable: one row per weight (w0..wd, scaled BIGINT) plus
    ``n_rows`` and ``n_correct`` under the 0.5 threshold."""
    spark = df.sparkSession
    model = logreg_fit(
        df, feature_cols, label_col, iterations, lr_num, lr_den, scale
    )
    scored = logreg_score(df, model, feature_cols)
    correct = scored.filter(
        F.col("prediction") == F.col(label_col).cast("int")
    ).count()
    rows = [(f"w{i}", int(model.weights[i])) for i in range(len(feature_cols) + 1)]
    rows += [("n_rows", int(model.n_rows)), ("n_correct", int(correct))]
    return spark.createDataFrame(rows, "name string, value long")


@dataclass(frozen=True)
class LinRegModel:
    weights_scaled: list[int]  # trunc-toward-zero of scale·detᵢ/det; [0]=bias
    scale: int
    n_rows: int


def linreg_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    scale: int = 10_000,
) -> LinRegModel:
    """Closed-form OLS by the normal equations — zero iterations, one
    map-side-combinable aggregate, exact everywhere:

    - the Gram matrix XᵀX and moment vector Xᵀy (with intercept) are
      EXACT integer sums over integer feature/label columns, accumulated
      in DECIMAL(38,0) (per-row products must fit BIGINT: |x|·|x| and
      |x|·|y| below 2⁶³);
    - the (d+1)×(d+1) system solves on the driver in exact rational
      arithmetic (``fractions.Fraction`` over the collected integer
      sums — d is feature count, not data size);
    - reported weights are ``trunc(scale · detᵢ/det)`` toward zero —
      the same truncation contract as ``logreg_fit`` (Spark ``div`` /
      DuckDB ``//`` of positives), so a SQL oracle can reproduce them
      digit-for-digit via Cramer determinants in HUGEINT.

    Raises ``ValueError`` on a singular system (collinear features).
    At 100 TB the shape is one scan + a (d+1)(d+4)/2-column aggregate;
    nothing driver-side scales with rows."""
    from fractions import Fraction

    d = len(feature_cols)
    cols = [F.lit(1).cast("long").alias("_x0")] + [
        F.col(c).cast("long").alias(f"_x{i + 1}") for i, c in enumerate(feature_cols)
    ]
    base = df.select(*cols, F.col(label_col).cast("long").alias("_y"))
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(d + 1):
        for j in range(i, d + 1):
            aggs.append(
                F.sum((F.col(f"_x{i}") * F.col(f"_x{j}")).cast(dec)).alias(f"a{i}_{j}")
            )
        aggs.append(F.sum((F.col(f"_x{i}") * F.col("_y")).cast(dec)).alias(f"b{i}"))
    row = base.agg(*aggs).collect()[0]
    n_rows = row["n"]
    A = [
        [int(row[f"a{min(i, j)}_{max(i, j)}"] or 0) for j in range(d + 1)]
        for i in range(d + 1)
    ]
    b = [int(row[f"b{i}"] or 0) for i in range(d + 1)]
    # exact Gaussian elimination over rationals (d+1 ≤ a handful)
    M = [[Fraction(v) for v in A[i]] + [Fraction(b[i])] for i in range(d + 1)]
    for col in range(d + 1):
        piv = next(
            (r for r in range(col, d + 1) if M[r][col] != 0),
            None,
        )
        if piv is None:
            raise ValueError(
                "singular normal equations (collinear features / empty input)"
            )
        M[col], M[piv] = M[piv], M[col]
        for r in range(d + 1):
            if r != col and M[r][col] != 0:
                f = M[r][col] / M[col][col]
                M[r] = [a - f * c for a, c in zip(M[r], M[col])]
    weights = [M[i][d + 1] / M[i][i] for i in range(d + 1)]
    scaled = [_tdiv(scale * w.numerator, w.denominator) for w in weights]
    return LinRegModel(weights_scaled=scaled, scale=scale, n_rows=n_rows)


def linreg_training_report(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    scale: int = 10_000,
) -> DataFrame:
    """Fit + evaluate as a relation (the ``logreg_training_report``
    contract): one row per scaled weight, ``n_rows``, and
    ``abs_err_scaled_sum`` = Σ|scale·y − (w0ₛ + Σ wiₛ·xᵢ)| — an exact
    integer fit-quality figure computable identically in SQL."""
    spark = df.sparkSession
    model = linreg_fit(df, feature_cols, label_col, scale)
    m_s = F.lit(model.weights_scaled[0]).cast("long")
    for i, c in enumerate(feature_cols):
        m_s = m_s + F.lit(model.weights_scaled[i + 1]).cast("long") * F.col(c).cast(
            "long"
        )
    err = df.agg(
        F.sum(
            F.abs(F.col(label_col).cast("long") * scale - m_s).cast("decimal(38,0)")
        ).alias("e")
    ).collect()[0]["e"]
    rows = [
        (f"w{i}", int(model.weights_scaled[i])) for i in range(len(feature_cols) + 1)
    ]
    rows += [("n_rows", int(model.n_rows)), ("abs_err_scaled_sum", int(err or 0))]
    return spark.createDataFrame(rows, "name string, value long")


@dataclass(frozen=True)
class KMeansModel:
    centroids: list[tuple[int, ...]]  # k tuples of d integer coordinates
    k: int
    iterations: int
    n_rows: int
    inertia: int  # Σ min squared distance under the FINAL centroids


def _assign_expr(feature_cols: list[str], centroids: list[tuple[int, ...]]) -> Column:
    """Cluster index of each row: argmin of exact integer squared
    distance, ties to the LOWEST centroid index (array_min over
    (dist, j) structs compares field-wise — deterministic under any
    partitioning)."""
    entries = []
    for j, c in enumerate(centroids):
        dist = None
        for i, col in enumerate(feature_cols):
            term = (F.col(col).cast("long") - F.lit(int(c[i]))) * (
                F.col(col).cast("long") - F.lit(int(c[i]))
            )
            dist = term if dist is None else dist + term
        entries.append(F.struct(dist.alias("d"), F.lit(j).alias("j")))
    return F.array_min(F.array(*entries))


def kmeans_fit(
    df: DataFrame,
    feature_cols: list[str],
    k: int = 3,
    iterations: int = 2,
) -> KMeansModel:
    """Lloyd's k-means in exact integer arithmetic — deterministic under
    any partitioning, hash-matchable by a SQL oracle:

    - init: the k lexicographically-smallest DISTINCT feature tuples
      (TakeOrdered — no RNG, no partition order dependence);
    - assignment: argmin of exact integer squared distance, ties to the
      lowest centroid index. Caller quantizes features so that
      d · max|x − c|² < 2⁶³ (the similarity-family convention);
    - update: per-cluster integer sums in DECIMAL(38,0), new coordinate
      = trunc-toward-zero sum/count (the shared ``_tdiv`` contract); an
      EMPTY cluster keeps its previous centroid;
    - inertia: Σ min squared distance under the final centroids,
      accumulated in DECIMAL(38,0).

    One scan + one map-side-combinable aggregate per iteration; the k·d
    centroid integers ride the plan as literals — nothing driver-side
    scales with rows."""
    d = len(feature_cols)
    init = (
        df.select(*feature_cols)
        .distinct()
        .orderBy(*feature_cols)
        .limit(k)
        .collect()
    )
    if len(init) < k:
        raise ValueError(
            f"need at least k={k} distinct feature tuples, got {len(init)}"
        )
    centroids = [tuple(int(r[c]) for c in feature_cols) for r in init]
    dec = "decimal(38,0)"
    n_rows = 0
    for _ in range(iterations):
        assign = _assign_expr(feature_cols, centroids)
        aggs = [F.count(F.lit(1)).alias("n")] + [
            F.sum(F.col(c).cast("long").cast(dec)).alias(f"s{i}")
            for i, c in enumerate(feature_cols)
        ]
        stats = {
            int(r["j"]): r
            for r in df.withColumn("j", assign["j"]).groupBy("j").agg(*aggs).collect()
        }
        n_rows = sum(int(r["n"]) for r in stats.values())
        centroids = [
            tuple(
                _tdiv(int(stats[j][f"s{i}"]), int(stats[j]["n"]))
                for i in range(d)
            )
            if j in stats
            else centroids[j]  # empty cluster keeps its centroid
            for j in range(k)
        ]
    inertia = (
        df.agg(
            F.sum(_assign_expr(feature_cols, centroids)["d"].cast(dec)).alias("i")
        ).collect()[0]["i"]
    )
    return KMeansModel(
        centroids=centroids,
        k=k,
        iterations=iterations,
        n_rows=n_rows,
        inertia=int(inertia or 0),
    )


def kmeans_training_report(
    df: DataFrame,
    feature_cols: list[str],
    k: int = 3,
    iterations: int = 2,
) -> DataFrame:
    """Fit + evaluate as a relation (the ml-family report contract): one
    row per centroid coordinate (``c{j}_{col}``), ``n_rows`` and the
    exact integer ``inertia``."""
    spark = df.sparkSession
    model = kmeans_fit(df, feature_cols, k, iterations)
    rows = [
        (f"c{j}_{col}", int(model.centroids[j][i]))
        for j in range(k)
        for i, col in enumerate(feature_cols)
    ]
    rows += [("inertia", model.inertia), ("n_rows", int(model.n_rows))]
    return spark.createDataFrame(rows, "name string, value long")


def naive_bayes_classify(
    docs: DataFrame,
    train_pred: Column,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Multinomial Naive Bayes text classifier, trained and applied in
    one dataflow — the deterministic stand-in for the fastText-style
    lang/quality classifiers a curation pipeline trains on labeled
    docs (DCLM, CCNet). Rows matching ``train_pred`` train the model;
    the REST are classified — a NULL predicate counts as "not train",
    so such rows are classified, never silently dropped (ADVICE r12:
    ``filter(pred)`` and ``filter(~pred)`` would BOTH drop NULL rows).
    Output: (id, <label_col> actual, predicted, score_micro) — one row
    per held-out doc.

    Engine-exact scoring (the lm_perplexity micro-nat discipline):
    every log term — class prior ln(docs_c/docs), Laplace token weight
    ln((n_ct+1)/(n_c+V)), unseen-token default ln(1/(n_c+V)) — is
    quantized to integer micro-nats BEFORE summation, so per-class
    scores are exact integer sums and the argmax (score DESC, label
    ASC) is bit-identical in any engine; libm's last-ulp wobble would
    have to move a term across a 0.5-micro-nat boundary to flip it.

    Scale shape: training is two token aggregates + a doc-count
    aggregate over the train split (map-side combined); the model —
    classes × vocab weight rows — stays a RELATION (never collected)
    and joins the held-out doc-token counts on the token key; the
    per-class fan-out is a broadcast of the C-row class relation. One
    argmax window on the doc key ends it."""
    from pyspark.sql import Window

    from muninn_avro_to_parquet_spark.operators.text import tokens

    # NULL predicate = held-out: every row lands in exactly one split
    train_pred = F.coalesce(train_pred.cast("boolean"), F.lit(False))
    base = docs.select(
        F.col(id_col),
        F.col(label_col),
        F.explode(tokens(F.col(text_col))).alias("token"),
        train_pred.alias("_train"),
    )
    tr = base.filter(F.col("_train"))
    # class token counts, class token totals, train vocab size (1 row)
    n_ct = tr.groupBy(label_col, "token").agg(F.count("*").alias("n_ct"))
    n_c = tr.groupBy(label_col).agg(F.count("*").alias("n_c"))
    vocab = tr.agg(F.countDistinct("token").alias("v"))
    tr_docs = (
        docs.filter(train_pred)
        .groupBy(label_col)
        .agg(F.count("*").alias("d_c"))
    )
    tr_total = docs.filter(train_pred).agg(F.count("*").alias("d_all"))
    classes = (
        n_c.join(F.broadcast(vocab))
        .join(tr_docs, label_col)
        .join(F.broadcast(tr_total))
        .select(
            F.col(label_col).alias("_cls"),
            F.round(
                F.log(F.col("d_c") / F.col("d_all")) * F.lit(1e6)
            )
            .cast("long")
            .alias("prior_micro"),
            F.round(
                F.log(F.lit(1.0) / (F.col("n_c") + F.col("v"))) * F.lit(1e6)
            )
            .cast("long")
            .alias("default_micro"),
            (F.col("n_c") + F.col("v")).alias("_den"),
        )
    )
    weights = n_ct.join(
        F.broadcast(classes), n_ct[label_col] == classes["_cls"]
    ).select(
        "_cls",
        "token",
        F.round(
            F.log((F.col("n_ct") + F.lit(1.0)) / F.col("_den")) * F.lit(1e6)
        )
        .cast("long")
        .alias("w_micro"),
    )
    # held-out doc-token counts × classes, unseen tokens at the class
    # default; argmax per doc by (score desc, class asc)
    dt = (
        base.filter(~F.col("_train"))
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("cnt"))
    )
    scored = (
        dt.crossJoin(F.broadcast(classes.select("_cls", "prior_micro", "default_micro")))
        .join(weights, ["_cls", "token"], "left")
        .groupBy(id_col, "_cls")
        .agg(
            (
                F.first("prior_micro")
                + F.sum(
                    F.col("cnt")
                    * F.coalesce(F.col("w_micro"), F.col("default_micro"))
                )
            )
            .cast("long")
            .alias("score_micro")
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("_cls").asc()
    )
    pred = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(id_col, F.col("_cls").alias("predicted"), "score_micro")
    )
    # a token-less held-out doc (empty/NULL text) has no rows in dt and
    # would vanish — the contract is one row per held-out doc, so it
    # falls back to the prior-only argmax (r12 review). The 1-row
    # best-prior relation broadcasts into the coalesce join.
    best_prior = (
        classes.orderBy(F.col("prior_micro").desc(), F.col("_cls").asc())
        .limit(1)
        .select(
            F.col("_cls").alias("_p_cls"),
            F.col("prior_micro").alias("_p_micro"),
        )
    )
    return (
        docs.filter(~train_pred)
        .select(id_col, label_col)
        .join(pred, id_col, "left")
        .crossJoin(F.broadcast(best_prior))
        .select(
            id_col,
            label_col,
            F.coalesce(F.col("predicted"), F.col("_p_cls")).alias("predicted"),
            F.coalesce(F.col("score_micro"), F.col("_p_micro"))
            .cast("long")
            .alias("score_micro"),
        )
    )
