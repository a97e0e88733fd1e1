"""Statistical-test operators over exact integer moments.

Not in the reference's surface (its analytics happen in the external
store); these are the north-star corpus/ops analytics a 100 TB pipeline
runs on its own metadata: independence tests between categorical
dimensions (is language mix independent of source?) and correlations
between numeric columns. The engine-portability rule throughout: every
sufficient statistic is an EXACT integer (counts, integer-cent sums,
sums of products), so the final test statistic is one fixed double
expression of exact integers — identical in any engine regardless of
partial-aggregation order (the hourly-anomaly convention; a naive
corr()/stddev over doubles is order-sensitive at display precision).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def chi2_independence(
    df: DataFrame, col_a: str, col_b: str, top: int = 20
) -> DataFrame:
    """Pearson chi-squared independence readout over two categorical
    columns: the contingency-cell contributions (observed, expected,
    (o−e)²/e), largest first — the per-cell view an analyst reads to
    see WHERE independence breaks, with the full χ² as the sum of the
    column. Expected counts e = row_total·col_total/N are exact
    rationals of integer counts.

    ZERO cells matter: a perfectly dependent table concentrates half
    its χ² in the UNOBSERVED cells (o=0, e>0) — a groupBy over the
    input never emits them, so the full |A|×|B| grid is rebuilt as
    the cross product of the two marginal relations (both bounded by
    their category counts, broadcastable) left-joined to the observed
    counts (law-tested: the dependent 2×2 yields χ² = n, not n/2).

    Scale shape: one keyed count per observed (a, b) cell (map-side
    combinable, output bounded by |A|·|B|), the two marginal relations
    derive from the cells (never a second input scan), and the grid /
    totals broadcast."""
    obs = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    row_t = obs.groupBy("a").agg(F.sum("o").alias("row_total"))
    col_t = obs.groupBy("b").agg(F.sum("o").alias("col_total"))
    n = obs.agg(F.sum("o").alias("n_total"))
    cells = (
        row_t.crossJoin(F.broadcast(col_t))
        .join(obs, ["a", "b"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0).cast("bigint")))
    )
    e = F.col("row_total") * F.col("col_total") / F.col("n_total")
    contrib = (F.col("o") - e) * (F.col("o") - e) / e
    return (
        cells.crossJoin(F.broadcast(n))
        .select(
            "a", "b", "o",
            F.round(e, 6).alias("expected"),
            F.round(contrib, 6).alias("chi2_contrib"),
        )
        .orderBy(F.desc("chi2_contrib"), "a", "b")
        .limit(int(top))
    )


def pearson_corr_exact(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_scale: int = 100,
    y_scale: int = 100,
) -> DataFrame:
    """Pearson correlation from exact integer moments: x and y carry
    fixed decimals, so ``round(v·scale)`` makes every sufficient
    statistic (n, Σx, Σy, Σx², Σy², Σxy) an exact bigint sum, and
    r = (nΣxy − ΣxΣy) / √((nΣx²−(Σx)²)(nΣy²−(Σy)²)) is ONE fixed
    double expression — the scale factors cancel, so r is the
    correlation of the original values. Returns one row (n, r).
    Built-in ``corr()`` aggregates doubles and is partial-agg-order
    sensitive at display precision; this is its reproducible twin,
    one map-side-combinable aggregate over the input.

    Overflow bound (why the scales are per-column and small):
    n · (max|x|·x_scale)² must stay below 2⁶³ — a price-like column
    at scale 100 squares to ~1e14 per row and overflows a bigint sum
    within ~10⁵ rows; pick the scale that just captures the column's
    decimals (quantities are integral → scale 1; discounts carry 2
    decimals → scale 100). Past the bound, move the moments to
    DECIMAL(38,0) — at the price of engine-specific exact types."""
    xi = F.round(F.col(x_col) * x_scale).cast("bigint")
    yi = F.round(F.col(y_col) * y_scale).cast("bigint")
    m = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xi).alias("sx"),
        F.sum(yi).alias("sy"),
        F.sum(xi * xi).alias("sxx"),
        F.sum(yi * yi).alias("syy"),
        F.sum(xi * yi).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    # each variance term fits a bigint under the documented bound, but
    # their PRODUCT does not — multiply as doubles (both engines write
    # the same `a * 1.0 * b`, so the double rounding is identical)
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.lit(1.0)
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select("n", F.round(num / den, 6).alias("r"))


def moment_stats(
    df: DataFrame,
    value_col: str,
    group_col: str,
    scale: int = 1,
) -> DataFrame:
    """Per-group mean / population variance / skewness / excess
    kurtosis from EXACT integer moments: with x quantized to an
    integer grid (round(v·scale)), the four power sums m1..m4 are
    exact bigint aggregates, and each shape statistic is one fixed
    double expression of them — reproducible across engines and
    partial-aggregation orders (built-in skewness()/kurtosis()
    accumulate doubles and drift at display precision; this is their
    reproducible twin, same convention as pearson_corr_exact).

    Formulas (population; μ = m1/n, central moments via the binomial
    expansion): var = m2/n − μ²; skew = (m3/n − 3μ·m2/n + 2μ³)/σ³;
    kurt_excess = (m4/n − 4μ·m3/n + 6μ²·m2/n − 3μ⁴)/σ⁴ − 3.

    Overflow bound: n·(max|x|·scale)⁴ < 2⁶³ — a 4-digit column at
    scale 1 leaves room for ~10⁸ rows per group; past that, the power
    sums move to DECIMAL(38,0) (Spark) / int128 (DuckDB) at the price
    of engine-specific exact types, or the grid coarsens.

    Scale shape: ONE map-combinable aggregate over the input; output
    is one row per group."""
    xi = F.round(F.col(value_col) * scale).cast("bigint")
    m = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xi).alias("m1"),
        F.sum(xi * xi).alias("m2"),
        F.sum(xi * xi * xi).alias("m3"),
        F.sum(xi * xi * xi * xi).alias("m4"),
    )
    n = F.col("n") * F.lit(1.0)
    mu = F.col("m1") / n
    var = F.col("m2") / n - mu * mu
    sd = F.sqrt(var)
    skew = (F.col("m3") / n - F.lit(3.0) * mu * (F.col("m2") / n)
            + F.lit(2.0) * mu * mu * mu) / (sd * sd * sd)
    kurt = (
        F.col("m4") / n
        - F.lit(4.0) * mu * (F.col("m3") / n)
        + F.lit(6.0) * mu * mu * (F.col("m2") / n)
        - F.lit(3.0) * mu * mu * mu * mu
    ) / (var * var) - F.lit(3.0)
    s = float(scale)
    return m.select(
        group_col,
        "n",
        F.round(mu / s, 6).alias("mean"),
        F.round(var / (s * s), 6).alias("variance"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("kurtosis_excess"),
    )


def pair_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 5,
    top: int = 20,
    max_basket: int | None = None,
) -> DataFrame:
    """Market-basket association mining: for every unordered item pair
    co-occurring in ≥ ``min_support`` baskets, the LIFT
    n_ab·N / (n_a·n_b) — how much more often the pair co-occurs than
    independence predicts (>1 = affinity, <1 = substitution). All
    counts are exact bigints from ONE collapsed distinct
    (basket, item) relation; the lift is the single double expression,
    displayed at 6 dp and ordered on the rounded value with the pair
    as tie-break (total order both engines replay).

    Heavy-basket valve (``max_basket``): the pair self-join fans out
    items²/basket, so ONE degenerate basket (a crawler cart, a bot
    session with 10⁵ items) costs 10¹⁰ pair rows in a single task.
    With ``max_basket`` set, baskets holding more than that many
    distinct items are EXCLUDED before every count — the standard
    association-mining cap (a degenerate basket carries no affinity
    signal; its pairs are noise at uniform support). Mechanically the
    same shape as the dedup hot-hash valve: a map-combinable size
    count, then the (tiny by construction) over-cap basket list
    broadcast as a LEFT ANTI probe — no window over the basket key,
    no sort. Result-INVISIBLE below the cap: when no basket exceeds
    ``max_basket`` the output is row-for-row identical to the
    unvalved form (all statistics, including n_baskets, are computed
    on the post-valve relation, so they stay self-consistent either
    way). Law-tested in tests/test_analytics.py (planted heavy
    basket + below-cap equality + broadcast-anti plan assert).
    Fan-out bound with the valve: ≤ max_basket·(max_basket−1)/2
    pairs per basket, linear in baskets.

    Scale shape: the raw input collapses once (map-combinable
    distinct); the pair counts self-join that relation on the basket —
    fan-out bounded by items²/basket (the ``max_basket`` valve is the
    cap for heavy-tailed baskets); item counts and the global basket
    count broadcast onto the pair result; the top-k cut is
    TakeOrderedAndProject."""
    bi = df.select(basket_col, item_col).distinct()
    if max_basket is not None:
        heavy = (
            bi.groupBy(basket_col)
            .agg(F.count(F.lit(1)).alias("_sz"))
            .filter(F.col("_sz") > int(max_basket))
            .select(basket_col)
        )
        bi = bi.join(F.broadcast(heavy), basket_col, "left_anti")
    n = bi.select(basket_col).distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_baskets")
    )
    item_n = bi.groupBy(item_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_item")
    )
    a = bi.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("item_a")
    )
    b = bi.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("item_b")
    )
    pairs = (
        a.join(b, "bk")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= int(min_support))
    )
    na = item_n.select(
        F.col(item_col).alias("item_a"), F.col("n_item").alias("n_a")
    )
    nb = item_n.select(
        F.col(item_col).alias("item_b"), F.col("n_item").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .crossJoin(F.broadcast(n))
        .select(
            "item_a", "item_b", "n_a", "n_b", "n_ab",
            F.round(
                (F.col("n_ab") * F.col("n_baskets"))
                / (F.lit(1.0) * F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "item_a", "item_b")
        .limit(int(top))
    )


def gini_concentration(
    df: DataFrame,
    value_col: str,
    group_col: str,
    scale: int = 1,
) -> DataFrame:
    """Per-group Gini coefficient of a non-negative quantity — the
    concentration/inequality readout ("is this source's character mass
    owned by a handful of giant documents?"). Uses the rank form
    G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over values sorted ascending.
    Rank ties need no tie-break: a tie block occupies a FIXED set of
    ranks and its values are equal, so Σᵢ i·xᵢ over the block is the
    same under every permutation — the aggregate (the only thing
    exposed) is engine-portable even though per-row row_number()
    assignments are not. Values
    quantize to an integer grid, so Σx and Σ i·xᵢ are exact bigints
    and G is one fixed double expression. Overflow bound:
    n²·max|x|·scale < 2⁶³.

    Scale shape: one rank window per group — a hash exchange on the
    group key plus a per-partition sort, so each GROUP's rows land in
    one task (not a range-partitioned sort; only a partition-less
    global sort range-partitions). Parallelism = number of groups,
    and a single extreme group serializes its own rank — the same
    cost family as rank_ensemble's global window, with the same
    documented approx ladder (rank_ensemble_approx's sketch-bucket
    form: approx-quantile bounds per group, grouped Σx per bucket,
    rank sums from bucket cumulative counts). Then a map-combinable
    aggregate bounded by the group count."""
    xi = F.round(F.col(value_col) * scale).cast("bigint")
    w = Window.partitionBy(group_col).orderBy(F.col("_x").asc())
    ranked = df.select(
        group_col, xi.alias("_x")
    ).withColumn("_i", F.row_number().over(w))
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_x").alias("sx"),
        F.sum(F.col("_i") * F.col("_x")).alias("six"),
    )
    n = F.col("n") * F.lit(1.0)
    g = (F.lit(2.0) * F.col("six")) / (n * F.col("sx")) - (
        (F.col("n") + F.lit(1)) / n
    )
    return agg.select(
        group_col, "n",
        F.round(g, 6).alias("gini"),
    ).orderBy(group_col)


def roc_auc(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "is_pos",
    group_col: str | None = None,
) -> DataFrame:
    """ROC-AUC as the tie-adjusted Mann-Whitney pair count — the
    classifier-evaluation primitive, computed WITHOUT ranking the
    corpus: AUC = P(score_pos > score_neg) + P(score_pos = score_neg)/2
    over all positive x negative pairs, so it only needs, per distinct
    score s, the positive count p_s, the negative count q_s, and the
    negatives strictly below s. 2U = sum_s(2*p_s*below_s + p_s*q_s) is
    an exact bigint (the factor 2 keeps the half-credit tie term
    integral) and AUC = 2U / (2*P*Q) is one final double division.

    ``scored``: one row per example with an orderable exact score (use
    integer scores — double scores group correctly only if both
    engines computed them identically) and a boolean label.

    Scale shape: one map-combinable groupBy onto the SCORE GRAIN
    (distinct scores, not examples), then one ordered cumulative
    window over that grain (per group when ``group_col`` is set) — the
    corpus never sorts globally. Overflow: 2U <= 2*P*Q requires
    P*Q < 2^62 (~2x10^9 balanced examples); past that the numerator
    moves to DECIMAL(38,0)."""
    keys = ([group_col] if group_col else []) + [score_col]
    grain = scored.groupBy(*keys).agg(
        F.sum(F.when(F.col(label_col), 1).otherwise(0))
        .cast("bigint")
        .alias("_p"),
        F.sum(F.when(F.col(label_col), 0).otherwise(1))
        .cast("bigint")
        .alias("_q"),
    )
    w_below = (
        Window.partitionBy(group_col) if group_col else Window.partitionBy()
    ).orderBy(score_col).rowsBetween(Window.unboundedPreceding, -1)
    u = grain.select(
        *([group_col] if group_col else []),
        "_p",
        "_q",
        F.coalesce(F.sum("_q").over(w_below), F.lit(0)).alias("_qb"),
    )
    gb = u.groupBy(group_col) if group_col else u.groupBy()
    return gb.agg(
        F.sum("_p").cast("bigint").alias("n_pos"),
        F.sum("_q").cast("bigint").alias("n_neg"),
        F.count(F.lit(1)).cast("bigint").alias("n_scores"),
        (
            F.sum(
                2 * F.col("_p") * F.col("_qb") + F.col("_p") * F.col("_q")
            ).cast("double")
            / (F.lit(2.0) * F.sum("_p") * F.sum("_q"))
        ).alias("auc"),
    )


def spearman_exact(
    df: DataFrame, x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """Spearman rank correlation with ties, EXACTLY and without
    ranking the input: 2x average ranks are integers (2*avgrank =
    2*count_below + count_tied + 1) built by an ordered cumulative
    window over each margin's VALUE GRID; centering by N+1 is exact
    (the 2x-rank total is N(N+1)), so rho = sum(m*cx*cy) /
    sqrt(sum(m*cx^2) * sum(m*cy^2)) over the pair-count grid with
    every moment an exact DECIMAL(38,0) integer (bounded by N^3 — 21
    digits at 10^7 rows). Inputs must be exact integer-valued columns
    (quantize floats first). Returns one row: n_rows, n_x_values,
    n_y_values, spearman_rho (raw double).

    Scale shape: ONE pass over the input builds the pair-count grid
    (a sufficient statistic), which is localCheckpointed and feeds
    every downstream branch — margins, rank maps, moments; the
    windows only ever touch |value grid| rows."""
    pair0 = (
        df.groupBy(x_col, y_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
        .localCheckpoint(eager=True)
    )
    n = pair0.agg(F.sum("m").cast("bigint").alias("n"))
    w_x = Window.orderBy(x_col).rowsBetween(Window.unboundedPreceding, -1)
    w_y = Window.orderBy(y_col).rowsBetween(Window.unboundedPreceding, -1)
    gx = pair0.groupBy(x_col).agg(F.sum("m").cast("bigint").alias("c"))
    gy = pair0.groupBy(y_col).agg(F.sum("m").cast("bigint").alias("c"))
    rx = gx.select(
        x_col,
        (2 * F.coalesce(F.sum("c").over(w_x), F.lit(0)) + F.col("c") + 1)
        .alias("r2"),
    ).crossJoin(F.broadcast(n)).select(
        x_col,
        (F.col("r2") - (F.col("n") + 1)).cast("decimal(19,0)").alias("cx"),
    )
    ry = gy.select(
        y_col,
        (2 * F.coalesce(F.sum("c").over(w_y), F.lit(0)) + F.col("c") + 1)
        .alias("r2"),
    ).crossJoin(F.broadcast(n)).select(
        y_col,
        (F.col("r2") - (F.col("n") + 1)).cast("decimal(19,0)").alias("cy"),
    )
    pair = pair0.select(
        x_col, y_col, F.col("m").cast("decimal(19,0)").alias("m")
    )
    mom = (
        pair.join(F.broadcast(rx), x_col)
        .join(F.broadcast(ry), y_col)
        .agg(
            F.sum(
                (F.col("m") * F.col("cx")).cast("decimal(38,0)") * F.col("cy")
            )
            .cast("double")
            .alias("sxy"),
            F.sum(
                (F.col("m") * F.col("cx")).cast("decimal(38,0)") * F.col("cx")
            )
            .cast("double")
            .alias("sxx"),
            F.sum(
                (F.col("m") * F.col("cy")).cast("decimal(38,0)") * F.col("cy")
            )
            .cast("double")
            .alias("syy"),
        )
    )
    nx = gx.agg(F.count(F.lit(1)).cast("bigint").alias("n_x_values"))
    ny = gy.agg(F.count(F.lit(1)).cast("bigint").alias("n_y_values"))
    return (
        n.crossJoin(F.broadcast(nx))
        .crossJoin(F.broadcast(ny))
        .crossJoin(F.broadcast(mom))
        .select(
            F.col("n").alias("n_rows"),
            "n_x_values",
            "n_y_values",
            (F.col("sxy") / F.sqrt(F.col("sxx") * F.col("syy"))).alias(
                "spearman_rho"
            ),
        )
    )


def poisson_bootstrap(
    df: DataFrame,
    id_col: str,
    value_col: str,
    b: int = 32,
    seed: str = "boot-v1",
    cdf: list[float] | None = None,
) -> DataFrame:
    """Poisson-bootstrap replicate sums (Chamandy et al. 2012) — the
    uncertainty primitive that scales: every row gets an independent
    Poisson(1) weight per replicate, so all B replicates compute in
    ONE pass (row-local explode + map-combinable groupBy; only B
    partial rows per partition cross the shuffle). Deterministic: the
    weight is a pinned 52-bit md5-uniform of (seed, replicate, id)
    compared against driver-inlined Poisson CDF literals. Replicate
    b=0 carries weight 1 unconditionally — its row IS the exact point
    estimate, for free in the same pass. Returns the checkpointed
    (b, n_b, sum_b) grain with exact bigint sums; ``value_col`` must
    be exact integers (quantize floats to cents first)."""
    if cdf is None:
        import math

        e = math.exp(-1.0)
        cdf, term, acc = [], e, 0.0
        for k in range(9):
            acc += term
            cdf.append(acc)
            term = term / (k + 1)
    rows = df.select(
        F.col(id_col).cast("string").alias("_id"),
        F.col(value_col).cast("bigint").alias("_v"),
        F.explode(F.sequence(F.lit(0), F.lit(int(b)))).alias("b"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed + ":"),
                        F.col("b").cast("string"),
                        F.lit(":"),
                        F.col("_id"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(2**52))
    w = F.when(F.col("b") == 0, 1).when(u < cdf[0], 0)
    for k in range(1, len(cdf)):
        w = w.when(u < cdf[k], k)
    w = w.otherwise(len(cdf))
    return (
        rows.select("b", "_v", w.alias("_w"))
        .groupBy("b")
        .agg(
            F.sum("_w").cast("bigint").alias("n_b"),
            F.sum(F.col("_w") * F.col("_v")).cast("bigint").alias("sum_b"),
        )
        .localCheckpoint(eager=True)
    )


def kendall_tau_exact(
    df: DataFrame, x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """Kendall tau-b with ties, EXACTLY and without enumerating row
    pairs: collapse to the (x, y) pair-count VALUE GRID, then classify
    every ordered grid-cell pair with ``b.x > a.x`` as concordant
    (``b.y > a.y``) or discordant (``b.y < a.y``), weighting by
    ``m_a * m_b`` — each unordered row pair with distinct x is counted
    exactly once. The tie terms come from the margins in DOUBLED form
    (no integer division anywhere): with 2*n0 = n(n-1),
    2*n1 = sum tx(tx-1), 2*n2 = sum ty(ty-1),
    tau_b = 2*(C - D) / sqrt((2n0-2n1) * (2n0-2n2)). Every count is an
    exact DECIMAL(38,0) integer (products bounded by n^2 and the tie
    terms by n^2, so the radicand is < 4n^4 — 29 digits at 10^7 rows);
    the only doubles are the final casts and one division. Inputs must
    be exact integer-valued columns (quantize floats first). Returns
    one row: n_rows, concordant, discordant, tau_b (raw double).

    Scale shape: ONE pass over the input builds the pair-count grid
    (a sufficient statistic, localCheckpointed); the cell-pair join is
    |grid|^2 — grid-bounded, never fact-bounded (50x11 margins mean
    ~3e5 cell pairs regardless of fact size)."""
    grid = (
        df.groupBy(x_col, y_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
        .localCheckpoint(eager=True)
    )
    a = grid.select(
        F.col(x_col).alias("_xa"),
        F.col(y_col).alias("_ya"),
        F.col("m").cast("decimal(19,0)").alias("_ma"),
    )
    b = grid.select(
        F.col(x_col).alias("_xb"),
        F.col(y_col).alias("_yb"),
        F.col("m").cast("decimal(19,0)").alias("_mb"),
    )
    cd = (
        a.join(F.broadcast(b), F.col("_xb") > F.col("_xa"))
        .agg(
            F.sum(
                F.when(
                    F.col("_yb") > F.col("_ya"),
                    (F.col("_ma") * F.col("_mb")).cast("decimal(38,0)"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("c"),
            F.sum(
                F.when(
                    F.col("_yb") < F.col("_ya"),
                    (F.col("_ma") * F.col("_mb")).cast("decimal(38,0)"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("d"),
        )
    )
    n = grid.agg(F.sum("m").cast("decimal(19,0)").alias("n"))
    tx = (
        grid.groupBy(x_col)
        .agg(F.sum("m").cast("decimal(19,0)").alias("t"))
        .agg(
            F.sum(
                (F.col("t") * (F.col("t") - 1)).cast("decimal(38,0)")
            ).alias("n1x2")
        )
    )
    ty = (
        grid.groupBy(y_col)
        .agg(F.sum("m").cast("decimal(19,0)").alias("t"))
        .agg(
            F.sum(
                (F.col("t") * (F.col("t") - 1)).cast("decimal(38,0)")
            ).alias("n2x2")
        )
    )
    return (
        n.crossJoin(F.broadcast(cd))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .select(
            F.col("n").cast("bigint").alias("n_rows"),
            F.col("c").cast("bigint").alias("concordant"),
            F.col("d").cast("bigint").alias("discordant"),
            (
                F.lit(2.0)
                * (F.col("c") - F.col("d")).cast("double")
                / F.sqrt(
                    (
                        (F.col("n") * (F.col("n") - 1)).cast("decimal(38,0)")
                        - F.col("n1x2")
                    ).cast("double")
                    * (
                        (F.col("n") * (F.col("n") - 1)).cast("decimal(38,0)")
                        - F.col("n2x2")
                    ).cast("double")
                )
            ).alias("tau_b"),
        )
    )


def benford_digits(
    df: DataFrame, value_col: str, expected: list[float]
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic synthetic-data / fraud screen a pipeline runs on monetary
    columns. The digit is extracted with INTEGER string arithmetic
    (first character of the bigint magnitude — no log10, no float
    seam); counts are exact bigints joined onto a dense 1..9 spine so
    zero-count digits still surface. ``expected`` is the list of
    P(digit = d) literals, driver-computed once and inlined into BOTH
    engines, so the chi-square terms are fixed double expressions of
    exact integers and identical literals. chi2_cum is the ORDERED
    cumulative sum over the digit spine (the house determinism trick
    for summing doubles) — the digit-9 row carries the full statistic.
    Input rows must be positive integer magnitudes (floor/quantize
    first). Returns 9 rows: digit, n, share, expected_share, chi2_cum
    (raw doubles).

    Scale shape: one map-combinable groupBy on a 9-value key; the
    spine join and the window touch 9 rows."""
    assert len(expected) == 9
    spark = df.sparkSession
    counts = (
        df.select(
            F.substring(F.col(value_col).cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    dense = spine.join(F.broadcast(counts), "digit", "left").select(
        "digit", F.coalesce("n", F.lit(0)).cast("bigint").alias("n")
    )
    tot = dense.agg(F.sum("n").cast("bigint").alias("tot"))
    exp_col = F.when(F.col("digit") == 1, F.lit(expected[0]))
    for d in range(2, 10):
        exp_col = exp_col.when(F.col("digit") == d, F.lit(expected[d - 1]))
    w = Window.orderBy("digit").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = dense.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.col("tot")).alias("share"),
        exp_col.alias("expected_share"),
        (
            (F.col("n").cast("double") - F.col("tot") * exp_col)
            * (F.col("n").cast("double") - F.col("tot") * exp_col)
            / (F.col("tot") * exp_col)
        ).alias("_chi2_term"),
    )
    return t.select(
        "digit",
        "n",
        "share",
        "expected_share",
        F.sum("_chi2_term").over(w).alias("chi2_cum"),
    )


def mann_kendall_sen(
    grain: DataFrame, time_col: str = "h", x_col: str = "x"
) -> DataFrame:
    """Mann-Kendall trend test + Sen's slope over an ordered grain —
    the nonparametric monotone-trend monitor (robust to outliers and
    any monotone transform, unlike an OLS slope on the raw counts).
    S = sum over ordered bucket pairs of sign(x_j - x_i) and the
    tie-corrected variance numerator var18 = n(n-1)(2n+5) -
    sum_t t(t-1)(2t+5) (var = var18/18) are exact bigints; the normal
    approximation z = (S -/+ 1)/sqrt(var18/18) and Sen's slope — the
    MEDIAN of the pairwise slopes (x_j - x_i)/(j - i) over the
    row-number distance — are fixed double expressions of exact
    integers (identical int divisions give identical doubles in any
    engine; the median is the order-insensitive R-7 percentile, the
    pinned Spark percentile == DuckDB quantile_cont parity). Input
    must be the aggregated grain (one row per bucket, exact integer
    value). Returns one row: n_buckets, s_stat, var18, z_mk,
    sen_slope (raw doubles).

    Scale shape: the pair join is |grain|^2/2 — grain-bounded, never
    fact-bounded (720 hourly buckets -> ~2.6e5 pairs regardless of
    fact size); the row_number window runs over grain rows only.
    Overflow: var18 < 2n^3 + 5n^2 — a 10^5-bucket (11-year hourly)
    grain stays inside 2^63."""
    w = Window.orderBy(time_col)
    r = grain.select(
        F.row_number().over(w).alias("_rn"),
        F.col(x_col).cast("bigint").alias("_x"),
    ).localCheckpoint(eager=True)
    a = r.select(F.col("_rn").alias("_ra"), F.col("_x").alias("_xa"))
    b = r.select(F.col("_rn").alias("_rb"), F.col("_x").alias("_xb"))
    pairs = a.join(F.broadcast(b), F.col("_rb") > F.col("_ra"))
    s = pairs.agg(
        F.sum(F.signum((F.col("_xb") - F.col("_xa")).cast("double")))
        .cast("bigint")
        .alias("s_stat"),
        F.expr(
            "percentile((_xb - _xa) / CAST(_rb - _ra AS DOUBLE), 0.5)"
        ).alias("sen_slope"),
    )
    n = r.agg(F.count(F.lit(1)).cast("bigint").alias("n_buckets"))
    ties = (
        r.groupBy("_x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("bigint")
            .alias("_tie18")
        )
    )
    return (
        n.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ties))
        .select(
            "n_buckets",
            "s_stat",
            (
                F.col("n_buckets")
                * (F.col("n_buckets") - 1)
                * (2 * F.col("n_buckets") + 5)
                - F.col("_tie18")
            )
            .cast("bigint")
            .alias("var18"),
            "sen_slope",
        )
        .select(
            "n_buckets",
            "s_stat",
            "var18",
            # var18 = 0 only when every bucket ties (one tie group
            # absorbs the full variance term) — the test is undefined
            # there, so z_mk is NULL rather than an ANSI 0/0 error.
            F.when(
                F.col("var18") > 0,
                (
                    F.col("s_stat").cast("double")
                    - F.signum(F.col("s_stat").cast("double"))
                )
                / F.sqrt(F.col("var18").cast("double") / F.lit(18.0)),
            ).alias("z_mk"),
            "sen_slope",
        )
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    score_scale: int = 1_000_000,
) -> DataFrame:
    """Reliability diagram + expected calibration error for a
    probabilistic classifier: scores in [0, 1] bin into ``n_bins``
    fixed-width buckets (bin = min(floor(s*B), B-1) — integer-exact
    given identical score doubles), and per bin the POSITIVE fraction
    (accuracy) is compared against the MEAN score (confidence). The
    mean-score trap: summing raw doubles across rows is
    partial-agg-order sensitive — so the score is quantized to an
    exact integer grid first (round(s * score_scale), the
    integer-cents convention) and confidence is one division of exact
    bigints. ece_cum accumulates |acc - conf| * n_b / N via the
    ORDERED cumulative window over the bin spine (<= n_bins rows) —
    the last bin's row carries the full ECE. Empty bins are kept via
    a dense spine (n = 0, null acc/conf, zero ECE contribution).
    Returns n_bins rows: bin, n, n_pos, acc, conf, ece_cum (raw
    doubles).

    Scale shape: ONE map-combinable groupBy on an n_bins-value key;
    the spine join and the window touch n_bins rows."""
    spark = df.sparkSession
    s = F.col(score_col)
    binned = df.select(
        F.least(
            F.floor(s * n_bins).cast("int"), F.lit(n_bins - 1)
        ).alias("bin"),
        F.round(s * score_scale).cast("bigint").alias("_si"),
        F.col(label_col).cast("boolean").alias("_y"),
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("_y"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        F.sum("_si").cast("bigint").alias("_ssum"),
    )
    spine = spark.range(0, n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    dense = spine.join(F.broadcast(agg), "bin", "left").select(
        "bin",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        F.coalesce("n_pos", F.lit(0)).cast("bigint").alias("n_pos"),
        F.coalesce("_ssum", F.lit(0)).cast("bigint").alias("_ssum"),
    ).localCheckpoint(eager=True)
    tot = dense.agg(F.sum("n").cast("bigint").alias("_tot"))
    acc = F.when(
        F.col("n") > 0, F.col("n_pos").cast("double") / F.col("n")
    )
    conf = F.when(
        F.col("n") > 0,
        F.col("_ssum").cast("double")
        / (F.lit(float(score_scale)) * F.col("n")),
    )
    w_cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    term = F.when(
        F.col("n") > 0,
        F.abs(acc - conf) * F.col("n") / F.col("_tot"),
    ).otherwise(F.lit(0.0))
    return (
        dense.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n",
            "n_pos",
            acc.alias("acc"),
            conf.alias("conf"),
            F.sum(term).over(w_cum).alias("ece_cum"),
        )
        .orderBy("bin")
    )


def zipf_ols(
    cnt: DataFrame,
    group_col: str = "lang",
    token_col: str = "tok",
    n_col: str = "n",
    top: int = 100,
) -> DataFrame:
    """Per-group Zipf rank-frequency OLS: slope/intercept of
    ln(count) on ln(rank) over the top ``top`` ranks. Determinism:
    ranks order by (count desc, token) — a TOTAL order; x = ln(rank)
    and y = ln(count) are doubles of exact integers (the accepted ln
    parity seam); the four OLS sums accumulate via ordered cumulative
    windows over the rank order (every term >= 0, so the running max
    IS the final value — the entropy-row pattern); slope =
    (K·Sxy − Sx·Sy)/(K·Sxx − Sx²) and intercept = (Sy − slope·Sx)/K
    are fixed double expressions of per-group scalars, NULL-guarded
    for the degenerate single-rank group. Input: the (group, token,
    count) grain. Returns one row per group: group, n_ranks,
    zipf_slope, zipf_intercept (raw doubles).

    Scale shape: the rank window runs over the vocabulary grain and
    the OLS windows over <= top rows per group — never fact rows."""
    w_r = Window.partitionBy(group_col).orderBy(
        F.desc(n_col), F.col(token_col)
    )
    top_df = (
        cnt.select(
            group_col, n_col, F.row_number().over(w_r).alias("_r")
        )
        .filter(F.col("_r") <= int(top))
        .select(
            group_col,
            "_r",
            F.log(F.col("_r").cast("double")).alias("_x"),
            F.log(F.col(n_col).cast("double")).alias("_y"),
        )
    )
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("_r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = top_df.select(
        group_col,
        "_r",
        F.sum("_x").over(w_cum).alias("_sx"),
        F.sum("_y").over(w_cum).alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).over(w_cum).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).over(w_cum).alias("_sxx"),
    )
    agg = cum.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ranks"),
        F.max("_sx").alias("_sx"),
        F.max("_sy").alias("_sy"),
        F.max("_sxy").alias("_sxy"),
        F.max("_sxx").alias("_sxx"),
    )
    den = F.col("n_ranks") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(
        den > 0,
        (F.col("n_ranks") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
        / den,
    )
    return agg.select(
        group_col,
        "n_ranks",
        slope.alias("zipf_slope"),
        ((F.col("_sy") - slope * F.col("_sx")) / F.col("n_ranks")).alias(
            "zipf_intercept"
        ),
    )


def ab_test_cuped(
    users: DataFrame,
    arm_col: str = "arm",
    y_col: str = "y",
    x_col: str = "x",
) -> DataFrame:
    """Two-arm experiment readout with CUPED variance reduction (Deng
    et al. 2013) from EXACT integer sufficient statistics: input is
    the USER-grain relation with a deterministic arm assignment, a
    0/1 outcome y and an integer pre-experiment covariate x. Per arm
    the counts/sums are exact bigints; the two-proportion z uses the
    pooled rate; theta = cov(y,x)/var(x) is computed POOLED over both
    arms from exact DECIMAL(38,0) moments (n·Sxy − Sy·Sx over
    n·Sxx − Sx²), and the CUPED-adjusted delta subtracts
    theta·(mean_x_b − mean_x_a) — every statistic one fixed double
    expression of exact integers. z is NULL when an arm is empty or
    the pooled rate is degenerate (0 or 1). Returns one row: n_a,
    n_b, conv_a, conv_b, rate_a, rate_b, delta, z, theta,
    cuped_delta (raw doubles).

    Scale shape: ONE map-combinable aggregate over the user grain
    feeding two broadcast scalars — the fact table never shuffles
    twice."""
    d = users.select(
        F.col(arm_col).alias("_a"),
        F.col(y_col).cast("bigint").alias("_y"),
        F.col(x_col).cast("decimal(19,0)").alias("_x"),
    )
    per = d.groupBy("_a").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_y").cast("bigint").alias("c"),
        F.sum("_x").cast("decimal(38,0)").alias("sx"),
    )
    a = per.filter(F.col("_a") == "A").select(
        F.col("n").alias("n_a"), F.col("c").alias("conv_a"),
        F.col("sx").alias("sx_a"),
    )
    b = per.filter(F.col("_a") == "B").select(
        F.col("n").alias("n_b"), F.col("c").alias("conv_b"),
        F.col("sx").alias("sx_b"),
    )
    mom = d.agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("nn"),
        F.sum("_y").cast("decimal(19,0)").alias("sy"),
        F.sum("_x").cast("decimal(38,0)").alias("sx"),
        F.sum((F.col("_x") * F.col("_x")).cast("decimal(38,0)")).alias(
            "sxx"
        ),
        F.sum((F.col("_y") * F.col("_x")).cast("decimal(38,0)")).alias(
            "sxy"
        ),
    )
    j = a.crossJoin(F.broadcast(b)).crossJoin(F.broadcast(mom))
    rate_a = F.col("conv_a") / (F.lit(1.0) * F.col("n_a"))
    rate_b = F.col("conv_b") / (F.lit(1.0) * F.col("n_b"))
    pool = (F.col("conv_a") + F.col("conv_b")) / (
        F.lit(1.0) * (F.col("n_a") + F.col("n_b"))
    )
    z = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.when(
            (F.col("conv_a") + F.col("conv_b") > 0)
            & (F.col("conv_a") + F.col("conv_b")
               < F.col("n_a") + F.col("n_b")),
            (rate_b - rate_a)
            / F.sqrt(
                pool
                * (1 - pool)
                * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
            ),
        ),
    )
    theta = (
        (F.col("nn") * F.col("sxy") - F.col("sy") * F.col("sx"))
        .cast("double")
        / (F.col("nn") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double")
    )
    mx_a = F.col("sx_a").cast("double") / F.col("n_a")
    mx_b = F.col("sx_b").cast("double") / F.col("n_b")
    return j.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        (rate_b - rate_a).alias("delta"),
        z.alias("z"),
        theta.alias("theta"),
        ((rate_b - rate_a) - theta * (mx_b - mx_a)).alias("cuped_delta"),
    )


def skyline_2d(
    df: DataFrame,
    cost_col: str,
    gain_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """2-D SKYLINE (Pareto frontier) per group — the multi-criteria
    dominance operator (Börzsönyi et al. 2001, "The Skyline
    Operator") relational engines bolt on and Spark lacks natively: a
    row survives iff no other row in its group is at-most-equal cost
    AND at-least-equal gain with one strict. The naive evaluation is
    the quadratic self-anti-join; in 2-D the frontier falls out of
    ONE ordered window pass instead — dominated(r) ⇔
    max{gain : cost < cost_r} >= gain_r OR max{gain : cost = cost_r}
    > gain_r — so the operator costs one keyed sort, O(n log n), no
    self-join at any scale (equal (cost, gain) duplicates are
    mutually non-dominating and all survive, per the definition's
    'one strict' clause). Both criteria must be exact integers
    (cents/units — the house money convention) so the frontier is
    bit-stable cross-engine — ENFORCED, not just documented (r12
    ADVICE): the strictly-cheaper window orders by the cost cast to
    bigint with rangeBetween(-1), so a fractional cost (10.2 vs 10.7)
    would land in neither the strict-less frame nor the equal-cost
    partition and a dominated row would silently survive. Non-integral
    cost/gain columns raise TypeError; convert money to cents first.

    Scale shape: one window over (group, cost order) — a single keyed
    exchange; the frontier result is output-bounded. The quadratic
    NOT EXISTS form remains the DIFFERENT-ALGORITHM oracle."""
    integral = {"tinyint", "smallint", "int", "bigint"}
    for col in (cost_col, gain_col):
        matches = [f for f in df.schema.fields if f.name == col]
        if not matches:
            # an exact-name miss must FAIL here, not fall through to
            # Spark's case-insensitive resolver — a case-mismatched
            # 'Cost' would otherwise bypass the integer guard entirely
            # (r13 review finding)
            raise TypeError(
                f"skyline_2d: column {col!r} not found in the schema "
                f"(exact match required; have "
                f"{[f.name for f in df.schema.fields]})"
            )
        if matches[0].dataType.simpleString() not in integral:
            raise TypeError(
                f"skyline_2d requires exact integer criteria; column "
                f"{col!r} is {matches[0].dataType.simpleString()} — "
                f"cast to cents/units (bigint) first"
            )
    gcols = [group_col] if group_col else []
    w_lt = (
        Window.partitionBy(*gcols)
        .orderBy(F.col(cost_col).cast("bigint"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy(*gcols, cost_col)
    lt_max = F.max(gain_col).over(w_lt)
    eq_max = F.max(gain_col).over(w_eq)
    return (
        df.withColumn("_lt", lt_max)
        .withColumn("_eq", eq_max)
        .filter(
            (F.col("_lt").isNull() | (F.col("_lt") < F.col(gain_col)))
            & (F.col("_eq") == F.col(gain_col))
        )
        .drop("_lt", "_eq")
    )


# Abramowitz & Stegun 7.1.26 rational-polynomial erfc coefficients
# (|absolute error| <= 1.5e-7 over x >= 0) — inlined as double
# literals so both engines parse the identical IEEE values.
_AS_ERFC_P = 0.3275911
_AS_ERFC_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027,
              1.061405429)
_INV_SQRT2_DEN = 1.4142135623730951  # repr(sqrt(2)) — driver-inlined


def pinned_normal_two_sided_p(z: Column) -> Column:
    """Two-sided normal-tail p-value 2·(1 − Φ(|z|)) = erfc(|z|/√2) as
    a PINNED fixed-order IEEE expression, so Spark and DuckDB produce
    bit-identical doubles (libm erfc/exp are NOT cross-engine bitwise
    — the measured r13/r14 seam; ln/log2 and IEEE +,−,×,/ and sqrt
    are). Two pinned pieces compose it:

    - Abramowitz & Stegun 7.1.26: erfc(x) = (a₁t + … + a₅t⁵)·e^(−x²),
      t = 1/(1 + p·x), |abs error| ≤ 1.5e-7 for x ≥ 0 — accuracy is
      secondary; the SAME value on both sides is the contract, and the
      1.5e-7 bound is only needed for the STATISTICAL claim.
    - e^(−x²) through the house pinned 30-term Horner
      (curation.pinned_exp) on the ×(1/64)-REDUCED argument −x²/64
      followed by SIX exact squarings: the raw argument can reach
      −x² ≈ −25 where a truncated Maclaurin series cancels
      catastrophically, but |−x²/64| ≤ 0.4 for |z| ≤ 7 where the
      series is accurate to ~1e-15, and each squaring is one exact
      IEEE multiply. Division by 64 is exact (power of two).

    The caller passes the ROUNDED z (6 dp, the display convention) so
    any sub-6dp engine wobble in z's own derivation cannot leak into
    p."""
    from ydb_vector_search_demo_spark.operators.curation import (
        pinned_exp_reduced,
    )

    a1, a2, a3, a4, a5 = (F.lit(c) for c in _AS_ERFC_A)
    x = F.abs(z) / F.lit(_INV_SQRT2_DEN)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_ERFC_P) * x)
    e = pinned_exp_reduced(-(x * x), squarings=6)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return poly * e


def hourly_anomaly_fdr(
    events: DataFrame,
    q_fdr: float = 0.1,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Group-wise volume-anomaly detection with BENJAMINI–HOCHBERG
    false-discovery-rate control (Benjamini & Hochberg 1995) — the
    multiple-testing closer of the anomaly family: the flat
    hourly_anomaly row thresholds each z in isolation, so at m =
    types×hours simultaneous tests a fixed z-cut drowns real spikes
    in expected false flags. Here every (event_type, hour) cell is a
    hypothesis: z from EXACT per-type integer moments (the
    hourly-anomaly convention), two-sided p = erfc(|z|/√2) via
    :func:`pinned_normal_two_sided_p`, then the BH step-up — rank
    p ascending (ties broken on (event_type, hour_start)), find
    k* = max{i : p₍ᵢ₎ ≤ i·q/m}, reject ranks 1..k*. Returns the
    rejected cells with (n, z, p_value, p_rank), p-ascending.

    Exactness: the moments (c, s1, s2) are exact bigints, z is the
    graded hourly_anomaly fixed double expression rounded to 6 dp, p
    is the pinned erfc of THAT rounded double, and the BH comparison
    p ≤ i·q/m is double vs (int·double/int) in one fixed order — every
    branch decision replays bit-identically cross-engine. Overflow:
    s1² needs per-type s1 < 3·10⁹ events; past that the moment
    products move to DECIMAL(38,0) at the documented price.

    Scale shape: one events scan collapses to the (type, hour) grain
    (map-combinable; localCheckpointed before its two consumers — the
    per-type moment branch and the z projection); the type-keyed
    moment join broadcasts (K types); the BH rank is ONE
    single-partition window over m grain rows — m is bounded by
    types×hours (a year of hourly grain at 100 types is <10⁶ rows),
    never by event volume. The scored and ranked relations are
    localCheckpointed so the 2⁶-squared pinned-exp expression tree is
    evaluated once and the k* branch does not re-run the sort."""
    h = (
        events.groupBy(
            F.col(type_col).alias("event_type"),
            F.date_trunc("hour", F.col(ts_col)).alias("hour_start"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    mom = h.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c"),
        F.sum("n").alias("_s1"),
        F.sum(F.col("n") * F.col("n")).alias("_s2"),
    )
    mean = F.col("_s1") / F.col("_c")
    var = (F.col("_s2") - F.col("_s1") * F.col("_s1") / F.col("_c")) / (
        F.col("_c") - F.lit(1)
    )
    z = F.round((F.col("n") - mean) / F.sqrt(var), 6)
    # the pinned p = erfc(|z|/√2) expression is enormous when spelled
    # whole: the 2^6 squaring chain duplicates the 30-term Horner
    # subtree 64 times (~40k expression nodes), and per-query CONSTRUCT
    # + ANALYZE of that tree on the driver dominated this grain-bounded
    # row (r15; the corpus_pair_bleu staging precedent). Staged: the
    # checkpoint materializes t and the Horner value h = e^(−x²/64) as
    # columns, and p = poly(t)·h^64 squares a plain COLUMN — the same
    # IEEE multiplies over the same doubles, ~70 nodes.
    from ydb_vector_search_demo_spark.operators.curation import pinned_exp

    x = F.abs(F.col("z")) / F.lit(_INV_SQRT2_DEN)
    scored = (
        h.join(F.broadcast(mom), "event_type")
        .filter((F.col("_c") > F.lit(1)) & (var > F.lit(0.0)))
        .select(
            "event_type",
            "hour_start",
            "n",
            z.alias("z"),
        )
        .withColumn(
            "_t", F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_ERFC_P) * x)
        )
        .withColumn("_h", pinned_exp(-(x * x) / F.lit(64.0)))
        .localCheckpoint(eager=True)
    )
    a1, a2, a3, a4, a5 = (F.lit(c) for c in _AS_ERFC_A)
    tc = F.col("_t")
    e = F.col("_h")
    for _ in range(6):
        e = e * e
    p_col = ((((a5 * tc + a4) * tc + a3) * tc + a2) * tc + a1) * tc * e
    m_row = scored.agg(F.count(F.lit(1)).cast("bigint").alias("_m"))
    ranked = (
        scored.withColumn("p", p_col)
        .crossJoin(F.broadcast(m_row))
        .withColumn(
            "p_rank",
            F.row_number().over(
                Window.orderBy("p", "event_type", "hour_start")
            ),
        )
        .select(
            "event_type", "hour_start", "n", "z", "p", "p_rank", "_m"
        )
        .localCheckpoint(eager=True)
    )
    ok = F.col("p") <= F.col("p_rank") * F.lit(float(q_fdr)) / F.col("_m")
    kstar = ranked.agg(
        F.max(F.when(ok, F.col("p_rank")).otherwise(F.lit(0))).alias("_k")
    )
    return (
        ranked.crossJoin(F.broadcast(kstar))
        .filter(F.col("p_rank") <= F.col("_k"))
        .select(
            "event_type",
            "hour_start",
            "n",
            "z",
            F.round("p", 12).alias("p_value"),
            "p_rank",
        )
        .orderBy("p_rank")
    )


def ks_drift_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    alpha_c: float = 1.224,
) -> DataFrame:
    """Per-group two-sample KOLMOGOROV–SMIRNOV drift test — the
    continuous-distribution sibling of :func:`chi2_independence`
    (categorical) in the corpus-governance family: for every group g,
    D = sup_v |F_g(v) − F_rest(v)| between the group's empirical CDF
    of ``value_col`` and the pooled rest — "which source's length/
    quality/score DISTRIBUTION has drifted", which mean-based
    monitors miss (two sources can share a mean and differ wildly in
    shape). Flags drift when D exceeds the classic two-sample
    critical value c(α)·√((n₁+n₂)/(n₁·n₂)); the default c = 1.224 is
    α = 0.10 (Smirnov; 1.358 is α = 0.05) — a driver-inlined literal.

    Exactness: D's supremum runs entirely on EXACT integers — at each
    grid value, gap = |n₂·C₁(v) − n₁·C₂(v)| (the common-denominator
    trick: comparing n₂C₁ − n₁C₂ avoids ever ordering derived
    doubles), the per-group max and its argmin location are integer
    decisions, and D = gap_max / (n₁·n₂) is ONE correctly-rounded
    IEEE division of exact ints. The sup is evaluated on the POOLED
    value grid — at values absent from the group, F_g stays flat
    while F_rest jumps, and the sup can land exactly there. Overflow:
    n₂·C₁ ≤ n_total², so n_total < 3·10⁹ rows; past that the gap
    arithmetic moves to DECIMAL(38,0).

    Scale shape: one input scan collapses to the (group, value) grain
    (map-combinable; localCheckpointed before its five consumers);
    the grid is |G|·|V| (groups × distinct values — bounded by the
    value domain, e.g. lengths/scores, not by row count); ONE keyed
    window per group computes both cumulative counts; the gap
    relation is checkpointed before its two consumers (the max branch
    and the argmax join-back). Returns one row per group:
    (group, n1, n2, at_value, d_num, d, crit, drift), group-ordered.

    Input contract (r14 review findings, all enforced/handled):
    ``value_col`` must be an exact integer column — the supremum's
    exactness depends on it, so a double (a raw [0,1) quality score
    would silently floor to one grid cell and hide all drift) raises
    TypeError; quantize scores first (the moment_stats scale
    convention). NULL values and NULL group keys are excluded up
    front — they can enter no CDF, and counting them into the totals
    while dropping them from the cumulative sums would inflate D. A
    group covering the whole input (n2 = 0) has no rest to test
    against and emits no row (the division would also trip Spark 4's
    ANSI double÷0)."""
    integral = {"tinyint", "smallint", "int", "bigint"}
    matches = [f for f in df.schema.fields if f.name == value_col]
    if not matches:
        raise TypeError(
            f"ks_drift_by_group: column {value_col!r} not found in the "
            f"schema (exact match required; have "
            f"{[f.name for f in df.schema.fields]})"
        )
    if matches[0].dataType.simpleString() not in integral:
        raise TypeError(
            f"ks_drift_by_group requires an exact integer value column; "
            f"{value_col!r} is {matches[0].dataType.simpleString()} — "
            f"quantize to a grid (round(v*scale)) first"
        )
    g, v = "_g", "_v"
    gv = (
        df.filter(
            F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .select(
            F.col(group_col).alias(g), F.col(value_col).cast("bigint").alias(v)
        )
        .groupBy(g, v)
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
        .localCheckpoint(eager=True)
    )
    vals = gv.select(v).distinct()
    grps = gv.groupBy(g).agg(F.sum("_c").cast("bigint").alias("_n1"))
    vc = gv.groupBy(v).agg(F.sum("_c").cast("bigint").alias("_cv"))
    tot = gv.agg(F.sum("_c").cast("bigint").alias("_nt"))
    grid = grps.crossJoin(vals)
    j = (
        grid.join(gv, [g, v], "left")
        .join(F.broadcast(vc), v)
        .withColumn("_c1", F.coalesce(F.col("_c"), F.lit(0).cast("bigint")))
    )
    w = (
        Window.partitionBy(g)
        .orderBy(v)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = j.select(
        g,
        "_n1",
        v,
        F.sum("_c1").over(w).cast("bigint").alias("_C1"),
        F.sum(F.col("_cv") - F.col("_c1")).over(w).cast("bigint").alias("_C2"),
    )
    gaps = (
        cum.crossJoin(F.broadcast(tot))
        .withColumn(
            "_gap",
            F.abs(
                (F.col("_nt") - F.col("_n1")) * F.col("_C1")
                - F.col("_n1") * F.col("_C2")
            ).cast("bigint"),
        )
        .localCheckpoint(eager=True)
    )
    d = gaps.groupBy(g, "_n1", "_nt").agg(
        F.max("_gap").cast("bigint").alias("d_num")
    )
    atv = (
        gaps.select(g, v, "_gap")
        .join(d.select(g, "d_num"), g)
        .filter(F.col("_gap") == F.col("d_num"))
        .groupBy(g)
        .agg(F.min(v).cast("bigint").alias("at_value"))
    )
    n2 = (F.col("_nt") - F.col("_n1")).cast("bigint")
    den = (F.col("_n1") * n2).cast("double")
    dd = F.col("d_num") / den
    crit = F.lit(float(alpha_c)) * F.sqrt(F.col("_nt").cast("double") / den)
    return (
        d.join(atv, g)
        .filter(F.col("_n1") < F.col("_nt"))
        .select(
            F.col(g).alias(group_col),
            F.col("_n1").alias("n1"),
            n2.alias("n2"),
            "at_value",
            "d_num",
            F.round(dd, 6).alias("d"),
            F.round(crit, 6).alias("crit"),
            (dd > crit).alias("drift"),
        )
        .orderBy(group_col)
    )


def mi_dependence(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """MUTUAL INFORMATION between two categorical columns — the
    EFFECT-SIZE companion of :func:`chi2_independence` (chi² answers
    "is the dependence statistically real?"; MI answers "how MUCH
    does one column determine the other", in nats) and the third leg
    of the dependence family next to the KL-drift readouts. Returns
    ONE row: (n, mi_nats, h_a_nats, h_b_nats, nmi) with
    MI = Σ_cells (n_xy/n)·ln(n·n_xy/(n_x·n_y)), the marginal Shannon
    entropies, and NMI = MI/√(H_a·H_b) (NULL when either marginal is
    degenerate — a single-category column carries no information and
    the ratio would divide by zero, the ANSI seam).

    Exactness: every count is an exact bigint; each cell term is
    (one IEEE division)·ln(one IEEE division of exact ints) — ln of
    exact-int ratios is the cross-engine-STABLE libm seam (unlike
    exp); the three signed/positive term sums accumulate through
    ORDERED cumulative windows over their grains (cells by (a, b),
    marginals by key) with the last row read via max_by(cum, rn) —
    double addition is not associative, and MI cell terms are
    SIGNED, so a plain max over the running sum would be wrong (the
    zipf monotone-cum shortcut does not apply). Unobserved cells
    contribute exactly 0 and are simply absent (no grid rebuild —
    unlike chi², where the zero cells carry half the statistic).
    Overflow: n·n_xy ≤ n², so n < 3·10⁹ rows; past that the ratio
    arguments move to DECIMAL(38,0).

    Scale shape: one input scan collapses to the (a, b) cell grain
    (map-combinable, output bounded by |A|·|B|; localCheckpointed
    before its three consumers); marginals derive from the cells —
    never a second scan; the three cumulative windows run over
    category-bounded relations; the final row is a broadcast
    assembly. NULL keys in either column are excluded up front (the
    ks_drift convention)."""
    cells = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("_a"), F.col(col_b).alias("_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
        .localCheckpoint(eager=True)
    )
    ra = cells.groupBy("_a").agg(F.sum("_c").cast("bigint").alias("_na"))
    rb = cells.groupBy("_b").agg(F.sum("_c").cast("bigint").alias("_nb"))
    tot = cells.agg(F.sum("_c").cast("bigint").alias("_n"))

    def last_of_cum(rel: DataFrame, term: Column, order_cols: list[str],
                    out: str) -> DataFrame:
        w = Window.orderBy(*order_cols)
        cum = rel.select(
            F.row_number().over(w).alias("_rn"),
            F.sum(term).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("_cum"),
        )
        return cum.agg(F.max_by("_cum", "_rn").alias(out))

    jc = (
        cells.join(F.broadcast(ra), "_a")
        .join(F.broadcast(rb), "_b")
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("_c").cast("double") / F.col("_n").cast("double")
    ratio = (F.col("_n") * F.col("_c")).cast("double") / (
        F.col("_na") * F.col("_nb")
    ).cast("double")
    mi = last_of_cum(jc, p * F.log(ratio), ["_a", "_b"], "_mi")
    ja = ra.crossJoin(F.broadcast(tot))
    pa = F.col("_na").cast("double") / F.col("_n").cast("double")
    ha = last_of_cum(ja, -(pa * F.log(pa)), ["_a"], "_ha")
    jb = rb.crossJoin(F.broadcast(tot))
    pb = F.col("_nb").cast("double") / F.col("_n").cast("double")
    hb = last_of_cum(jb, -(pb * F.log(pb)), ["_b"], "_hb")
    nmi = F.when(
        (F.col("_ha") > F.lit(0.0)) & (F.col("_hb") > F.lit(0.0)),
        F.col("_mi") / F.sqrt(F.col("_ha") * F.col("_hb")),
    )
    return (
        tot.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
        .select(
            F.col("_n").alias("n"),
            F.round("_mi", 6).alias("mi_nats"),
            F.round("_ha", 6).alias("h_a_nats"),
            F.round("_hb", 6).alias("h_b_nats"),
            F.round(nmi, 6).alias("nmi"),
        )
    )


def average_precision(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "is_pos",
    group_col: str | None = None,
) -> DataFrame:
    """AVERAGE PRECISION (area under the precision-recall curve by
    step-function integration, the sklearn definition) — the
    PR-side companion of :func:`roc_auc`: under heavy class
    imbalance, ROC-AUC stays rosy while AP collapses toward the
    prevalence baseline, which is exactly the regime a curation
    filter lives in (few positives, many negatives). Tie-robust by
    construction: thresholds are the DISTINCT scores descending, each
    score block enters atomically —
    AP = Σ_blocks (p_s/P) · (cumTP_s / cumN_s) with cumTP/cumN taken
    at the block END; no within-tie ordering ambiguity exists (the
    naive per-row Σ P@k·rel_k silently depends on how ties shuffle).
    The no-skill baseline is the prevalence P/(P+Q), reported
    alongside so a "great" AP on a 99%-positive slice reads honestly.

    Exactness: block counts are exact bigints from ONE map-combinable
    groupBy onto the score grain (the roc_auc shape — the corpus
    never sorts globally); each block term is two IEEE divisions and
    a product; the block sum folds through an ordered cumulative
    window (score DESCENDING) read at the last row via max_by — the
    signed-fold convention, though AP terms are positive.

    Returns per group: (n_pos, n_neg, n_scores, prevalence, ap)."""
    keys = ([group_col] if group_col else []) + [score_col]
    grain = (
        scored.groupBy(*keys)
        .agg(
            F.sum(F.when(F.col(label_col), 1).otherwise(0))
            .cast("bigint")
            .alias("_p"),
            F.sum(F.when(F.col(label_col), 0).otherwise(1))
            .cast("bigint")
            .alias("_q"),
        )
        # the totals join back onto the cumulative relation derived
        # from the same grain — checkpoint breaks the self-join
        # lineage (AMBIGUOUS_REFERENCE otherwise) and caps the input
        # scan at one (the mi_dependence convention)
        .localCheckpoint(eager=True)
    )
    part = (
        Window.partitionBy(group_col) if group_col else Window.partitionBy()
    )
    w_cum = part.orderBy(F.desc(score_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = grain.select(
        *([group_col] if group_col else []),
        "_p",
        "_q",
        F.sum("_p").over(w_cum).cast("bigint").alias("_ctp"),
        F.sum(F.col("_p") + F.col("_q")).over(w_cum).cast("bigint").alias(
            "_cn"
        ),
        F.row_number().over(part.orderBy(F.desc(score_col))).alias("_rn"),
    )
    tot = grain.groupBy(*([group_col] if group_col else [])).agg(
        F.sum("_p").cast("bigint").alias("_ptot"),
        F.sum("_q").cast("bigint").alias("_qtot"),
        F.count(F.lit(1)).cast("bigint").alias("n_scores"),
    )
    j = (
        cum.join(F.broadcast(tot), group_col)
        if group_col
        else cum.crossJoin(F.broadcast(tot))
    )
    # _ptot = 0 (a group with no positives) would make the term 0/0 —
    # ANSI throws (seam #11); the whole AP is NULL for such a group,
    # so the fold is CASE-gated per row. (Totals are named _ptot/_qtot,
    # not _P/_Q: Spark's default resolver is case-INsensitive, so _P
    # would collide with the grain's _p — measured AMBIGUOUS_REFERENCE.)
    term = F.when(
        F.col("_ptot") > F.lit(0),
        (F.col("_p").cast("double") / F.col("_ptot").cast("double"))
        * (F.col("_ctp").cast("double") / F.col("_cn").cast("double")),
    ).otherwise(F.lit(0.0))
    w_ap = part.orderBy("_rn").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    folded = j.select(
        *([group_col] if group_col else []),
        "_ptot",
        "_qtot",
        "n_scores",
        "_rn",
        F.sum(term).over(w_ap).alias("_cum_ap"),
    )
    gb = (
        folded.groupBy(group_col, "_ptot", "_qtot", "n_scores")
        if group_col
        else folded.groupBy("_ptot", "_qtot", "n_scores")
    )
    prev = F.col("_ptot").cast("double") / (
        F.col("_ptot") + F.col("_qtot")
    ).cast("double")
    return gb.agg(F.max_by("_cum_ap", "_rn").alias("_ap")).select(
        *([group_col] if group_col else []),
        F.col("_ptot").alias("n_pos"),
        F.col("_qtot").alias("n_neg"),
        "n_scores",
        F.round(prev, 6).alias("prevalence"),
        F.round(
            F.when(F.col("_ptot") > F.lit(0), F.col("_ap")), 6
        ).alias("ap"),
    )
