package graft.queries

import org.apache.spark.sql.functions._
import graft.fundamentals.{QualityScores, Statements}
import graft.sqlx.Exact.r4
import OracleSql.rd

/** Fundamental statement + quality-score queries with mirrored DuckDB
  * oracles (transform_balance_sheet / cash_flow / income_statement /
  * fundamental_quality_scores). SQL layers mirror the Spark op DAG
  * exactly; see graft.fundamentals for the operator implementations. */
object FundamentalQueries {

  // ---------------------------------------------------------------- shared SQL
  private val bySym = "PARTITION BY symbol_id ORDER BY fiscal_q"

  private val stmtCte: String =
    """o AS (
      |  SELECT o_custkey AS symbol_id, year(o_orderdate) AS fy, quarter(o_orderdate) AS fq,
      |         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS tca
      |  FROM orders GROUP BY 1, 2, 3
      |),
      |li AS (
      |  SELECT o_custkey AS symbol_id, year(o_orderdate) AS fy, quarter(o_orderdate) AS fq,
      |         CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS revenue,
      |         CAST(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS opex,
      |         CAST(CAST(SUM(CAST(l_extendedprice * l_tax AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS tcl,
      |         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS inventory,
      |         CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * l_tax AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS cogs
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2, 3
      |),
      |stmt AS (
      |  SELECT o.symbol_id, make_date(o.fy, (o.fq - 1) * 3 + 1, 1) AS fiscal_q,
      |         c.c_nationkey AS sector, c.c_mktsegment AS industry,
      |         o.tca, greatest(c.c_acctbal, 0.0) AS cash,
      |         li.revenue, li.opex, li.tcl, li.inventory, li.cogs,
      |         o.tca + greatest(c.c_acctbal, 0.0) + li.inventory AS total_assets,
      |         li.tcl + li.opex AS total_liabilities,
      |         (o.tca + greatest(c.c_acctbal, 0.0) + li.inventory) - (li.tcl + li.opex) AS equity,
      |         li.revenue - li.cogs AS gross_profit,
      |         (li.revenue - li.cogs) - li.opex AS operating_income,
      |         ((li.revenue - li.cogs) - li.opex) - li.tcl AS net_income,
      |         (li.revenue - li.cogs) - li.opex AS ocf,
      |         li.inventory AS capex,
      |         ((li.revenue - li.cogs) - li.opex) - abs(li.inventory) AS fcf
      |  FROM o JOIN li ON o.symbol_id = li.symbol_id AND o.fy = li.fy AND o.fq = li.fq
      |       JOIN customer c ON c.c_custkey = o.symbol_id
      |)""".stripMargin

  private def sdiv(num: String, den: String) = s"$num / ($den + 1e-06)"

  /** Ratio layer mirroring Statements.full's per-row columns. */
  private val ratioCte: String =
    s"""fb AS (
       |  SELECT symbol_id, fiscal_q, sector, industry,
       |    row_number() OVER ($bySym) AS rn,
       |    revenue, net_income, ocf, capex, fcf,
       |    ${sdiv("tca", "tcl")} AS cr,
       |    ${sdiv("(tca - inventory)", "tcl")} AS qr,
       |    ${sdiv("cash", "tcl")} AS cash_ratio,
       |    tca - tcl AS working_capital,
       |    ${sdiv("total_liabilities", "equity")} AS de,
       |    ${sdiv("total_liabilities", "total_assets")} AS da,
       |    ${sdiv("(total_assets - inventory)", "total_assets")} AS tar,
       |    ${sdiv("ocf", "capex")} AS ocf_capex,
       |    ${sdiv("ocf", "net_income")} AS conv,
       |    ${sdiv("capex", "revenue")} AS capex_intensity,
       |    ${sdiv("ocf", "revenue")} AS ocf_margin,
       |    ${sdiv("gross_profit", "revenue")} AS gm,
       |    ${sdiv("operating_income", "revenue")} AS om,
       |    ${sdiv("net_income", "revenue")} AS nm
       |  FROM stmt
       |)""".stripMargin

  private def lagSql(v: String, k: Int, as: String) = s"lag($v, $k) OVER ($bySym) AS $as"
  private def pct(v: String, l: String) = s"CASE WHEN $l <> 0 THEN ($v - $l) / $l END"

  private def rankSql(v: String, part: String): String = {
    val le = s"COUNT($v) OVER (PARTITION BY $part ORDER BY $v)"
    val eq = s"COUNT($v) OVER (PARTITION BY $part, $v)"
    val n = s"COUNT($v) OVER (PARTITION BY $part)"
    s"CASE WHEN $v IS NOT NULL THEN ($le - $eq + ($eq + 1) / 2.0) / $n END"
  }

  /** Fixed-order two-pass rolling(4, min 2) stddev, mirroring Statements.vol4
    * op-for-op (no decimals — see that scaladoc). `mean` is a named column
    * from the fw2 layer. */
  private def rollMeanSql(v: String, p: String): String =
    s"($v + COALESCE(${p}_l1, 0.0) + COALESCE(${p}_l2, 0.0) + COALESCE(${p}_l3, 0.0)) / CAST(LEAST(rn, 4) AS DOUBLE)"

  private def stdSql(v: String, p: String, mean: String): String = {
    def sq(x: String) = s"CASE WHEN $x IS NOT NULL THEN ($x - $mean) * ($x - $mean) ELSE 0.0 END"
    val num = s"${sq(v)} + ${sq(s"${p}_l1")} + ${sq(s"${p}_l2")} + ${sq(s"${p}_l3")}"
    s"CASE WHEN rn >= 2 THEN SQRT(($num) / (CAST(LEAST(rn, 4) AS DOUBLE) - 1.0)) END"
  }

  /** Window layer: lags, volatility sums, percentile ranks. */
  private val winCte: String =
    s"""fw AS (
       |  SELECT fb.*,
       |    ${lagSql("cr", 1, "cr_l1")}, ${lagSql("cr", 2, "cr_l2")}, ${lagSql("cr", 3, "cr_l3")},
       |    ${lagSql("cr", 4, "cr_l4")}, ${lagSql("qr", 1, "qr_l1")},
       |    ${lagSql("ocf", 1, "ocf_l1")}, ${lagSql("ocf", 2, "ocf_l2")}, ${lagSql("ocf", 3, "ocf_l3")},
       |    ${lagSql("ocf", 4, "ocf_l4")},
       |    ${lagSql("fcf", 1, "fcf_l1")}, ${lagSql("fcf", 4, "fcf_l4")},
       |    ${lagSql("revenue", 1, "rev_l1")}, ${lagSql("revenue", 2, "rev_l2")}, ${lagSql("revenue", 3, "rev_l3")},
       |    ${lagSql("revenue", 4, "rev_l4")},
       |    ${lagSql("net_income", 1, "ni_l1")}, ${lagSql("net_income", 4, "ni_l4")},
       |    ${rankSql("cr", "fiscal_q, sector")} AS cr_sector_rank,
       |    ${rankSql("cr", "fiscal_q, industry")} AS cr_industry_rank,
       |    ${rankSql("ocf", "fiscal_q, sector")} AS ocf_sector_rank,
       |    ${rankSql("fcf", "fiscal_q, sector")} AS fcf_sector_rank,
       |    ${rankSql("nm", "fiscal_q, sector")} AS nm_sector_rank,
       |    ${rankSql("om", "fiscal_q, sector")} AS om_sector_rank
       |  FROM fb
       |),
       |fw2 AS (
       |  SELECT fw.*,
       |    ${rollMeanSql("cr", "cr")} AS cr_mean,
       |    ${rollMeanSql("ocf", "ocf")} AS ocf_mean,
       |    ${rollMeanSql("revenue", "rev")} AS rev_mean
       |  FROM fw
       |),
       |fx AS (
       |  SELECT fw2.*,
       |    ${pct("cr", "cr_l1")} AS cr_qoq, ${pct("qr", "qr_l1")} AS qr_qoq, ${pct("cr", "cr_l4")} AS cr_yoy,
       |    ${pct("ocf", "ocf_l1")} AS ocf_qoq, ${pct("ocf", "ocf_l4")} AS ocf_yoy,
       |    ${pct("fcf", "fcf_l1")} AS fcf_qoq, ${pct("fcf", "fcf_l4")} AS fcf_yoy,
       |    ${pct("revenue", "rev_l1")} AS rev_qoq, ${pct("revenue", "rev_l4")} AS rev_yoy,
       |    ${pct("net_income", "ni_l1")} AS ni_qoq, ${pct("net_income", "ni_l4")} AS ni_yoy,
       |    ${stdSql("cr", "cr", "cr_mean")} AS cr_vol,
       |    ${stdSql("ocf", "ocf", "ocf_mean")} AS ocf_vol,
       |    ${stdSql("revenue", "rev", "rev_mean")} AS rev_vol
       |  FROM fw2
       |),
       |fz AS (
       |  SELECT fx.*,
       |    CAST(CASE WHEN cr_qoq < -0.2 THEN 1 ELSE 0 END AS INTEGER) AS liquidity_shock_flag,
       |    CAST(CASE WHEN fcf < 0.0 THEN 1 ELSE 0 END AS INTEGER) AS negative_fcf_flag,
       |    CAST(CASE WHEN fcf < 0.0 AND ocf < 0.0 THEN 1 ELSE 0 END AS INTEGER) AS cash_burn_flag,
       |    CAST(CASE WHEN net_income < 0.0 THEN 1 ELSE 0 END AS INTEGER) AS negative_net_income_flag,
       |    CAST(CASE WHEN rev_yoy < 0.0 THEN 1 ELSE 0 END AS INTEGER) AS revenue_decline_flag
       |  FROM fx
       |)""".stripMargin

  private[queries] val prelude = s"WITH $stmtCte,\n$ratioCte,\n$winCte"

  // ---------------------------------------------------------------- queries
  private def sel(df: org.apache.spark.sql.DataFrame,
                  cols: Seq[org.apache.spark.sql.Column]) =
    df.select((Seq(col("symbol_id"), col("fiscal_q")) ++ cols): _*).orderBy("symbol_id", "fiscal_q")

  private val fundBalanceSheet = Q(
    (s, d) => sel(Statements.full(s, d), Seq(
      col("fbs_current_ratio").as("current_ratio"),
      col("fbs_quick_ratio").as("quick_ratio"),
      col("fbs_cash_ratio").as("cash_ratio"),
      col("fbs_working_capital").as("working_capital"),
      col("fbs_debt_to_equity").as("debt_to_equity"),
      col("fbs_debt_to_assets").as("debt_to_assets"),
      col("fbs_tangible_asset_ratio").as("tangible_asset_ratio"),
      col("fbs_current_ratio_qoq_pct").as("current_ratio_qoq_pct"),
      col("fbs_quick_ratio_qoq_pct").as("quick_ratio_qoq_pct"),
      col("fbs_current_ratio_yoy_pct").as("current_ratio_yoy_pct"),
      col("fbs_current_ratio_volatility").as("current_ratio_volatility"),
      col("fbs_current_ratio_sector_rank").as("current_ratio_sector_rank"),
      col("fbs_current_ratio_industry_rank").as("current_ratio_industry_rank"),
      col("fbs_liquidity_shock_flag").as("liquidity_shock_flag"))),
    s"""$prelude
       |SELECT symbol_id, fiscal_q,
       |  cr AS current_ratio, qr AS quick_ratio, cash_ratio AS cash_ratio,
       |  working_capital AS working_capital, de AS debt_to_equity, da AS debt_to_assets,
       |  tar AS tangible_asset_ratio, cr_qoq AS current_ratio_qoq_pct,
       |  qr_qoq AS quick_ratio_qoq_pct, cr_yoy AS current_ratio_yoy_pct,
       |  cr_vol AS current_ratio_volatility, cr_sector_rank AS current_ratio_sector_rank,
       |  cr_industry_rank AS current_ratio_industry_rank,
       |  liquidity_shock_flag
       |FROM fz ORDER BY symbol_id, fiscal_q""".stripMargin)

  private val fundCashFlow = Q(
    (s, d) => sel(Statements.full(s, d), Seq(
      col("fcf_free_cash_flow").as("free_cash_flow"),
      col("fcf_ocf_to_capex_ratio").as("ocf_to_capex_ratio"),
      col("fcf_cash_conversion_ratio").as("cash_conversion_ratio"),
      col("fcf_capex_intensity").as("capex_intensity"),
      col("fcf_operating_cf_margin").as("operating_cf_margin"),
      col("fcf_operating_cf_qoq_pct").as("operating_cf_qoq_pct"),
      col("fcf_free_cash_flow_qoq_pct").as("free_cash_flow_qoq_pct"),
      col("fcf_operating_cf_yoy_pct").as("operating_cf_yoy_pct"),
      col("fcf_free_cash_flow_yoy_pct").as("free_cash_flow_yoy_pct"),
      col("fcf_operating_cf_volatility").as("operating_cf_volatility"),
      col("fcf_operating_cf_sector_rank").as("operating_cf_sector_rank"),
      col("fcf_free_cash_flow_sector_rank").as("free_cash_flow_sector_rank"),
      col("fcf_negative_free_cash_flow_flag").as("negative_free_cash_flow_flag"),
      col("fcf_cash_burn_flag").as("cash_burn_flag"))),
    s"""$prelude
       |SELECT symbol_id, fiscal_q,
       |  fcf AS free_cash_flow, ocf_capex AS ocf_to_capex_ratio,
       |  conv AS cash_conversion_ratio, capex_intensity AS capex_intensity,
       |  ocf_margin AS operating_cf_margin, ocf_qoq AS operating_cf_qoq_pct,
       |  fcf_qoq AS free_cash_flow_qoq_pct, ocf_yoy AS operating_cf_yoy_pct,
       |  fcf_yoy AS free_cash_flow_yoy_pct, ocf_vol AS operating_cf_volatility,
       |  ocf_sector_rank AS operating_cf_sector_rank, fcf_sector_rank AS free_cash_flow_sector_rank,
       |  negative_fcf_flag AS negative_free_cash_flow_flag,
       |  cash_burn_flag
       |FROM fz ORDER BY symbol_id, fiscal_q""".stripMargin)

  private val fundIncomeStatement = Q(
    (s, d) => sel(Statements.full(s, d), Seq(
      r4(col("fis_gross_margin")).as("gross_margin"),
      r4(col("fis_operating_margin")).as("operating_margin"),
      r4(col("fis_net_margin")).as("net_margin"),
      r4(col("fis_revenue_qoq_pct")).as("revenue_qoq_pct"),
      r4(col("fis_net_income_qoq_pct")).as("net_income_qoq_pct"),
      r4(col("fis_revenue_yoy_pct")).as("revenue_yoy_pct"),
      r4(col("fis_net_income_yoy_pct")).as("net_income_yoy_pct"),
      r4(col("fis_revenue_volatility")).as("revenue_volatility"),
      r4(col("fis_net_margin_sector_rank")).as("net_margin_sector_rank"),
      r4(col("fis_operating_margin_sector_rank")).as("operating_margin_sector_rank"),
      col("fis_negative_net_income_flag").as("negative_net_income_flag"),
      col("fis_revenue_decline_flag").as("revenue_decline_flag"))),
    s"""$prelude
       |SELECT symbol_id, fiscal_q,
       |  ${rd("gm", "gross_margin")}, ${rd("om", "operating_margin")}, ${rd("nm", "net_margin")},
       |  ${rd("rev_qoq", "revenue_qoq_pct")}, ${rd("ni_qoq", "net_income_qoq_pct")},
       |  ${rd("rev_yoy", "revenue_yoy_pct")}, ${rd("ni_yoy", "net_income_yoy_pct")},
       |  ${rd("rev_vol", "revenue_volatility")}, ${rd("nm_sector_rank", "net_margin_sector_rank")},
       |  ${rd("om_sector_rank", "operating_margin_sector_rank")},
       |  negative_net_income_flag, revenue_decline_flag
       |FROM fz ORDER BY symbol_id, fiscal_q""".stripMargin)

  // ---------------------------------------------------------------- quality scores
  private def normSql(x: String, lo: String, hi: String, rev: Boolean = false): String = {
    val scaled = s"(LEAST(GREATEST($x, $lo), $hi) - $lo) / ($hi - $lo)"
    val oriented = if (rev) s"(1.0 - $scaled)" else scaled
    s"CASE WHEN $x IS NOT NULL THEN $oriented * 100.0 END"
  }
  private def meanSql(cols: String*): String = {
    val s = cols.map(c => s"COALESCE($c, 0.0)").mkString(" + ")
    val n = cols.map(c => s"CASE WHEN $c IS NULL THEN 0.0 ELSE 1.0 END").mkString(" + ")
    s"CASE WHEN ($n) > 0.0 THEN ($s) / ($n) END"
  }
  private def clipSql(c: String): String =
    s"CASE WHEN $c IS NOT NULL THEN LEAST(GREATEST($c, 0.0), 100.0) END"

  private[queries] val scoresPrelude: String = {
    val boundsCte =
      """fvals AS (SELECT fcf AS v FROM fz WHERE fcf IS NOT NULL),
        |franked AS (SELECT v, row_number() OVER (ORDER BY v) AS frn, COUNT(*) OVER () AS fn FROM fvals),
        |bounds AS (
        |  SELECT
        |    MAX(CASE WHEN frn = floor(0.2 * CAST(fn - 1 AS DOUBLE)) + 1 THEN v END)
        |      + (COALESCE(MAX(CASE WHEN frn = floor(0.2 * CAST(fn - 1 AS DOUBLE)) + 2 THEN v END),
        |                  MAX(CASE WHEN frn = floor(0.2 * CAST(fn - 1 AS DOUBLE)) + 1 THEN v END))
        |         - MAX(CASE WHEN frn = floor(0.2 * CAST(fn - 1 AS DOUBLE)) + 1 THEN v END))
        |        * MAX(CASE WHEN frn = floor(0.2 * CAST(fn - 1 AS DOUBLE)) + 1
        |              THEN 0.2 * CAST(fn - 1 AS DOUBLE) - floor(0.2 * CAST(fn - 1 AS DOUBLE)) END) AS fcf_q20,
        |    MAX(CASE WHEN frn = floor(0.8 * CAST(fn - 1 AS DOUBLE)) + 1 THEN v END)
        |      + (COALESCE(MAX(CASE WHEN frn = floor(0.8 * CAST(fn - 1 AS DOUBLE)) + 2 THEN v END),
        |                  MAX(CASE WHEN frn = floor(0.8 * CAST(fn - 1 AS DOUBLE)) + 1 THEN v END))
        |         - MAX(CASE WHEN frn = floor(0.8 * CAST(fn - 1 AS DOUBLE)) + 1 THEN v END))
        |        * MAX(CASE WHEN frn = floor(0.8 * CAST(fn - 1 AS DOUBLE)) + 1
        |              THEN 0.8 * CAST(fn - 1 AS DOUBLE) - floor(0.8 * CAST(fn - 1 AS DOUBLE)) END) AS fcf_q80
        |  FROM franked
        |)""".stripMargin
    val bsLiq = meanSql(normSql("cr", "0.5", "2.5"), normSql("qr", "0.3", "1.5"))
    val bsLev = meanSql(normSql("de", "0.0", "3.0", rev = true), normSql("da", "0.0", "0.8", rev = true))
    val bsAsset = normSql("tar", "0.3", "0.95")
    val cfGen = meanSql(normSql("fcf", "fcf_q20", "fcf_q80"), normSql("ocf_margin", "0.05", "0.25"))
    val cfEff = meanSql(normSql("ocf_capex", "0.5", "3.0"), normSql("conv", "0.5", "1.5"))
    val cfSus = meanSql(normSql("fcf_yoy", "-0.20", "0.30"))
    val isProf = meanSql(normSql("nm", "0.05", "0.25"))
    val isMarg = meanSql(normSql("om", "0.05", "0.30"), normSql("gm", "0.20", "0.60"))
    val isGrow = meanSql(normSql("rev_yoy", "-0.05", "0.20"), normSql("ni_yoy", "-0.20", "0.30"))
    s"""$prelude,
       |$boundsCte,
       |sc1 AS (
       |  SELECT fz.*,
       |    $bsLiq AS bs_liq, $bsLev AS bs_lev, $bsAsset AS bs_asset,
       |    $cfGen AS cf_gen, $cfEff AS cf_eff, $cfSus AS cf_sus,
       |    $isProf AS is_prof, $isMarg AS is_marg, $isGrow AS is_grow
       |  FROM fz CROSS JOIN bounds
       |),
       |sc2 AS (
       |  SELECT sc1.*,
       |    CASE WHEN liquidity_shock_flag = 1
       |         THEN (bs_liq * 0.30 + bs_lev * 0.40 + bs_asset * 0.30) * 0.8
       |         ELSE bs_liq * 0.30 + bs_lev * 0.40 + bs_asset * 0.30 END AS bs_score,
       |    CASE WHEN cash_burn_flag = 1
       |         THEN (CASE WHEN negative_fcf_flag = 1
       |                    THEN (cf_gen * 0.40 + cf_eff * 0.30 + cf_sus * 0.30) * 0.7
       |                    ELSE cf_gen * 0.40 + cf_eff * 0.30 + cf_sus * 0.30 END) * 0.5
       |         ELSE CASE WHEN negative_fcf_flag = 1
       |                   THEN (cf_gen * 0.40 + cf_eff * 0.30 + cf_sus * 0.30) * 0.7
       |                   ELSE cf_gen * 0.40 + cf_eff * 0.30 + cf_sus * 0.30 END END AS cf_score,
       |    CASE WHEN revenue_decline_flag = 1
       |         THEN (CASE WHEN negative_net_income_flag = 1
       |                    THEN (is_prof * 0.40 + is_marg * 0.30 + is_grow * 0.30) * 0.6
       |                    ELSE is_prof * 0.40 + is_marg * 0.30 + is_grow * 0.30 END) * 0.85
       |         ELSE CASE WHEN negative_net_income_flag = 1
       |                   THEN (is_prof * 0.40 + is_marg * 0.30 + is_grow * 0.30) * 0.6
       |                   ELSE is_prof * 0.40 + is_marg * 0.30 + is_grow * 0.30 END END AS is_score
       |  FROM sc1
       |),
       |sc3 AS (
       |  SELECT sc2.*,
       |    ${clipSql("bs_score")} AS bs_clip, ${clipSql("cf_score")} AS cf_clip, ${clipSql("is_score")} AS is_clip
       |  FROM sc2
       |),
       |scores AS (
       |  SELECT symbol_id, fiscal_q,
       |    ${clipSql("bs_liq")} AS bs_liquidity_score,
       |    ${clipSql("bs_lev")} AS bs_leverage_score,
       |    ${clipSql("bs_asset")} AS bs_asset_quality_score,
       |    bs_clip AS balance_sheet_quality_score,
       |    ${clipSql("cf_gen")} AS cf_generation_score,
       |    ${clipSql("cf_eff")} AS cf_efficiency_score,
       |    ${clipSql("cf_sus")} AS cf_sustainability_score,
       |    cf_clip AS cash_flow_quality_score,
       |    ${clipSql("is_prof")} AS is_profitability_score,
       |    ${clipSql("is_marg")} AS is_margin_score,
       |    ${clipSql("is_grow")} AS is_growth_score,
       |    is_clip AS income_statement_quality_score,
       |    ${clipSql("COALESCE(bs_clip, 50.0) * 0.33 + COALESCE(cf_clip, 50.0) * 0.33 + COALESCE(is_clip, 50.0) * 0.34")} AS overall_quality_score,
       |    (${clipSql("COALESCE(bs_clip, 50.0) * 0.33 + COALESCE(cf_clip, 50.0) * 0.33 + COALESCE(is_clip, 50.0) * 0.34")}) >= 70.0 AS is_high_quality,
       |    COALESCE(bs_clip >= 50.0, FALSE) AND COALESCE(cf_clip >= 50.0, FALSE) AND COALESCE(is_clip >= 50.0, FALSE) AS is_investment_grade,
       |    liquidity_shock_flag = 1 OR cash_burn_flag = 1 OR negative_net_income_flag = 1 AS has_red_flags
       |  FROM sc3
       |)""".stripMargin
  }

  private val scoresOracle: String = {
    val cols = Seq("bs_liquidity_score", "bs_leverage_score", "bs_asset_quality_score",
      "balance_sheet_quality_score", "cf_generation_score", "cf_efficiency_score",
      "cf_sustainability_score", "cash_flow_quality_score", "is_profitability_score",
      "is_margin_score", "is_growth_score", "income_statement_quality_score",
      "overall_quality_score").map(c => rd(c, c))
    s"""$scoresPrelude
       |SELECT symbol_id, fiscal_q,
       |  ${cols.mkString(",\n  ")},
       |  is_high_quality, is_investment_grade, has_red_flags
       |FROM scores ORDER BY symbol_id, fiscal_q""".stripMargin
  }

  private val fundQualityScores = Q(
    (s, d) => sel(QualityScores.scores(s, d), Seq(
      r4(col("bs_liquidity_score")).as("bs_liquidity_score"),
      r4(col("bs_leverage_score")).as("bs_leverage_score"),
      r4(col("bs_asset_quality_score")).as("bs_asset_quality_score"),
      r4(col("balance_sheet_quality_score")).as("balance_sheet_quality_score"),
      r4(col("cf_generation_score")).as("cf_generation_score"),
      r4(col("cf_efficiency_score")).as("cf_efficiency_score"),
      r4(col("cf_sustainability_score")).as("cf_sustainability_score"),
      r4(col("cash_flow_quality_score")).as("cash_flow_quality_score"),
      r4(col("is_profitability_score")).as("is_profitability_score"),
      r4(col("is_margin_score")).as("is_margin_score"),
      r4(col("is_growth_score")).as("is_growth_score"),
      r4(col("income_statement_quality_score")).as("income_statement_quality_score"),
      r4(col("overall_quality_score")).as("overall_quality_score"),
      col("is_high_quality"), col("is_investment_grade"), col("has_red_flags"))),
    scoresOracle)

  val all: Map[String, Q] = Map(
    "fund_balance_sheet" -> fundBalanceSheet,
    "fund_cash_flow" -> fundCashFlow,
    "fund_income_statement" -> fundIncomeStatement,
    "fund_quality_scores" -> fundQualityScores)
}
