"""Reusable statistical data-quality / drift diagnostics over ARBITRARY
DataFrames.

Phase 6 of the library-extraction program (dedup/ann r10,
textops/sampling/curation r11, graphalgs/embeddings/retrieval r12): the
forensic screens behind the ``diag_*`` / ``a_*`` diagnostic registry
queries as parameterized functions::

    from yelpdatawarehouse_spark.operators import stats
    bad   = stats.mad_outliers(events, "value", keep, cut=3.5)
    grid  = stats.chi2_grid(orders, "o_orderpriority", "o_orderstatus")
    ben   = stats.benford_profile(orders, "o_totalprice")
    gini  = stats.gini_by_group(spend, "nation", "s", tie_col="custkey")
    drift = stats.psi_profile(orders, "o_totalprice",
                              ref=F.col("o_orderpriority") == "1-URGENT")

Reference analog: none — the reference ships dashboards, not data-quality
gates; this is the ingest-QA surface a training-data pipeline runs before
admission (SURVEY §6).

Design rules (the registry queries' DuckDB oracles pin the semantics):

* Robust statistics use EXACT interpolated percentiles (Spark
  ``percentile`` ≡ DuckDB ``quantile_cont``); at true 100 TB the
  caller swaps in approx_percentile with an envelope oracle — the same
  trade the sketch family documents.
* Ratio statistics guard their degenerate denominators with CASE (ANSI
  division would throw; CASE branches short-circuit where codegen'd
  conjunctions do not) and the oracle carries the same guard.
* Scale shapes: every screen is scan → key-sized (or 1-row broadcast)
  aggregate → codegen predicate/expression; nothing downstream of the
  counting aggregates scales with the fact table. Gini's ranking
  windows partition BY GROUP — never a single-partition global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.presentation import rfix

__all__ = [
    "mad_outliers",
    "chi2_grid",
    "benford_profile",
    "gini_by_group",
    "psi_profile",
]


def mad_outliers(
    df: DataFrame,
    value_col: str = "value",
    keep_cols: Sequence[Column] = (),
    k: float = 0.6745,
    cut: float = 3.5,
    digits: int = 4,
) -> DataFrame:
    """Modified z-score outlier screen (Iglewicz & Hoaglin 1993):
    |k·(x − median)/MAD| > ``cut``, median and MAD both EXACT
    interpolated percentiles — robust where mean/stddev are poisoned by
    the very outliers being hunted. Returns the outlier rows:
    ``keep_cols`` (already-aliased Columns) + the rounded value and
    modified z. ``k=0.6745`` (Φ⁻¹(0.75)) scales MAD to σ-equivalent
    units; 3.5 is the authors' recommended rejection threshold.

    A majority-identical column has MAD = 0 and the z is undefined —
    by spec such a degenerate column yields no outliers (CASE-guarded,
    NULL never exceeds the cut). NULL values are pruned at the scan.

    Scale shape: two global exact-percentile aggregates, each reducing
    to a single broadcast row; the outlier filter is then a codegen'd
    scan predicate — no shuffle touches the fact table itself.
    """
    e = df.filter(F.col(value_col).isNotNull())
    med = F.broadcast(e.agg(F.expr(f"percentile({value_col}, 0.5)").alias("_m")))
    mad = F.broadcast(
        e.crossJoin(med).agg(
            F.expr(f"percentile(abs({value_col} - _m), 0.5)").alias("_d")
        )
    )
    mz = F.when(
        F.col("_d") > 0,
        F.lit(k) * (F.col(value_col) - F.col("_m")) / F.col("_d"),
    )
    return (
        e.crossJoin(med)
        .crossJoin(mad)
        .filter(F.abs(mz) > cut)
        .select(
            *keep_cols,
            rfix(F.col(value_col), digits).alias(value_col),
            rfix(mz, digits).alias("modified_z"),
        )
    )


def chi2_grid(
    df: DataFrame,
    row_col: str,
    col_col: str,
    out_cols: tuple[str, str] = ("row_value", "col_value"),
    digits: int = 4,
) -> DataFrame:
    """Pearson chi-square contingency grid over two categorical columns:
    every cell of the FULL cross (zero-observed cells included — they
    carry chi2 mass equal to their expectation) with observed count,
    expected count under independence (row_total·col_total/N), and the
    cell's chi-square contribution. Sum(chi2_contrib) with dof
    (|rows|−1)(|cols|−1) is the test statistic; emitting per-cell keeps
    the result auditable.

    Scale shape: three map-side-partial counting aggregates over one
    scan lineage; the grid is |rows|·|cols| rows built by a broadcast
    cross of two KEY-sized aggregates.
    """
    ro, co = out_cols
    obs = df.groupBy(
        F.col(row_col).alias("_p"), F.col(col_col).alias("_s")
    ).agg(F.count("*").alias("_o"))
    rows_ = df.groupBy(F.col(row_col).alias("_p")).agg(
        F.count("*").alias("_rt")
    )
    cols_ = df.groupBy(F.col(col_col).alias("_s")).agg(
        F.count("*").alias("_ct")
    )
    n = F.broadcast(df.agg(F.count("*").cast("double").alias("_n")))
    grid = (
        rows_.crossJoin(F.broadcast(cols_))
        .join(obs, ["_p", "_s"], "left")
        .crossJoin(n)
        .select(
            "_p",
            "_s",
            F.coalesce(F.col("_o"), F.lit(0)).alias("_o"),
            (F.col("_rt") * F.col("_ct") / F.col("_n")).alias("_e"),
        )
    )
    return grid.select(
        F.col("_p").alias(ro),
        F.col("_s").alias(co),
        F.col("_o").cast("long").alias("observed"),
        rfix(F.col("_e"), digits).alias("expected"),
        rfix(
            (F.col("_o") - F.col("_e")) * (F.col("_o") - F.col("_e"))
            / F.col("_e"),
            digits,
        ).alias("chi2_contrib"),
    )


def benford_profile(
    df: DataFrame,
    value_col: str,
    digits_p: int = 6,
    digits_chi: int = 4,
) -> DataFrame:
    """Benford's-law first-digit profile: observed vs theoretical
    P(d) = log10(1 + 1/d) for d = 1..9 (all nine rows always present,
    zero-observed digits included — their chi-square mass is the
    strongest fabrication signal), plus each digit's contribution
    n·(p_obs − p_ben)²/p_ben. The classic forensic screen for
    synthetic/truncated numerics in ingest QA. Values < 1 are excluded
    (their first significant digit needs decimal-shift handling).

    Scale shape: the first digit is a codegen'd string expression on the
    scan, collapsed by one 9-key map-side-partial aggregate; the digit
    spine is a 9-row broadcast.
    """
    digits_df = df.filter(F.col(value_col) >= 1).select(
        F.substring(
            F.floor(value_col).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("d")
    )
    obs = digits_df.groupBy("d").agg(F.count("*").alias("o"))
    n = F.broadcast(digits_df.agg(F.count("*").cast("double").alias("n")))
    spine = df.sparkSession.range(1, 10).select(F.col("id").alias("d"))
    ben = F.log10(1.0 + 1.0 / F.col("d"))
    return (
        spine.join(obs, "d", "left")
        .crossJoin(n)
        .select(
            F.col("d").cast("long").alias("digit"),
            F.coalesce(F.col("o"), F.lit(0)).cast("long").alias("observed"),
            rfix(ben, digits_p).alias("benford_p"),
            F.when(
                F.col("n") > 0,
                rfix(F.coalesce(F.col("o"), F.lit(0)) / F.col("n"), digits_p),
            ).alias("observed_p"),
            F.when(
                F.col("n") > 0,
                rfix(
                    (F.coalesce(F.col("o"), F.lit(0)) / F.col("n") - ben)
                    * (F.coalesce(F.col("o"), F.lit(0)) / F.col("n") - ben)
                    / ben
                    * F.col("n"),
                    digits_chi,
                ),
            ).alias("chi2_contrib"),
        )
    )


def gini_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tie_col: str,
    out_cols: tuple[str, str, str, str] = ("group", "n_entities",
                                           "total_value", "gini"),
    digits_total: int = 2,
    digits_gini: int = 4,
) -> DataFrame:
    """Exact Gini coefficient of ``value_col`` within each group, via the
    rank formulation G = 2·Σ(r·x)/(n·Σx) − (n+1)/n over ascending
    (value, tie) ranks — tie order cannot change Σ(r·x) across equal
    values, so the statistic is deterministic while the window order
    stays total. The concentration diagnostic that flags both value
    inequality and, read as key frequencies, shuffle-skew risk.

    ``df`` is one row per (group, entity) with the entity's value;
    ``tie_col`` is the unique entity key breaking rank ties.

    Scale shape: ranking partitions BY GROUP, so the sort is
    partition-parallel (never a single-partition global window); one
    exchange for the rank partition, one for the rollup.
    """
    go, no, to, gi = out_cols
    w = Window.partitionBy(group_col).orderBy(value_col, tie_col)
    wp = Window.partitionBy(group_col)
    ranked = df.select(
        group_col,
        value_col,
        F.row_number().over(w).alias("_r"),
        F.count("*").over(wp).alias("_n"),
        F.sum(value_col).over(wp).alias("_tot"),
    )
    return ranked.groupBy(F.col(group_col).alias(go)).agg(
        F.max("_n").cast("long").alias(no),
        rfix(F.max("_tot"), digits_total).alias(to),
        rfix(
            2.0 * F.sum(F.col("_r") * F.col(value_col))
            / (F.max("_n") * F.max("_tot"))
            - (F.max("_n") + 1.0) / F.max("_n"),
            digits_gini,
        ).alias(gi),
    )


def psi_profile(
    df: DataFrame,
    value_col: str,
    ref: Column,
    n_edges: int = 9,
    digits_edges: int = 6,
    digits: int = 6,
) -> DataFrame:
    """Population Stability Index per bin: the reference population
    (rows where ``ref`` is true) defines ``n_edges`` exact-percentile
    bin edges — canonicalized to ``digits_edges`` BEFORE binning, so
    the cut lines are byte-identical on both engines — and both
    populations are histogrammed against them; each bin contributes
    (p_ref − p_cmp)·ln(p_ref/p_cmp), whose sum is the PSI drift alarm
    (> 0.25 conventionally "significant shift"). Returns
    (bin, n_ref, n_cmp, psi_contrib) with empty-side bins NULL-guarded.

    Scale shape: the edge computation is one exact-percentile aggregate
    over the (pushed-filter) reference scan, broadcast as a 1-row
    frame; binning is a codegen'd CASE chain on the main scan; the
    rollup is an (n_edges+1)-key map-side-partial aggregate with the
    totals broadcast back. At true 100 TB the edges swap to
    approx_percentile — the sketch family's documented trade.
    """
    step = 1.0 / (n_edges + 1)
    edges = F.broadcast(
        df.filter(ref).agg(
            *[
                rfix(
                    F.expr(f"percentile({value_col}, {step * (k + 1):.10f})"),
                    digits_edges,
                ).alias(f"_e{k}")
                for k in range(n_edges)
            ]
        )
    )
    bin_col = F.lit(n_edges)
    for k in reversed(range(n_edges)):
        bin_col = F.when(
            F.col(value_col) < F.col(f"_e{k}"), F.lit(k)
        ).otherwise(bin_col)
    counts = (
        df.crossJoin(edges)
        .select(bin_col.alias("bin"), ref.alias("_is_ref"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("_is_ref"), 1).otherwise(0)).alias("nr"),
            F.sum(F.when(F.col("_is_ref"), 0).otherwise(1)).alias("nc"),
        )
    )
    tot = F.broadcast(
        counts.agg(
            F.sum("nr").cast("double").alias("tr"),
            F.sum("nc").cast("double").alias("tc"),
        )
    )
    p = F.col("nr") / F.col("tr")
    q = F.col("nc") / F.col("tc")
    return counts.crossJoin(tot).select(
        F.col("bin").cast("long").alias("bin"),
        F.col("nr").cast("long").alias("n_ref"),
        F.col("nc").cast("long").alias("n_cmp"),
        F.when(
            (F.col("nr") > 0) & (F.col("nc") > 0),
            rfix((p - q) * F.log(p / q), digits),
        ).alias("psi_contrib"),
    )
