package graft.backtest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sqlx.Exact.{dec, decSumAgg}

/** Strategy performance metrics (backtest_strategies.py:304-389): win rate,
  * total/avg returns, max drawdown (running cumulative-capital peak over
  * exit-date order), annualized Sharpe (population std, √252), profit
  * factor, holding/commission stats.
  *
  * Sums of trade pnl go through exact decimals and the population std uses
  * the explicit Σx/Σx² formula — group/window float association differs
  * between engines, and the oracle must reproduce these numbers exactly.
  * Drawdown needs a per-strategy cumulative scan — windows partition by
  * strategy over the already-small simulation output. */
object Metrics {
  def perStrategy(trades: DataFrame,
                  initialCapital: Double = Simulator.InitialCapital): DataFrame = {
    val byExit = Window.partitionBy("trade_strategy")
      .orderBy("exit_date", "symbol_id", "entry_date")
    val cum = trades
      .withColumn("cum_pnl", sum(dec(col("pnl"))).over(byExit).cast("double"))
      .withColumn("cum_capital", lit(initialCapital) + col("cum_pnl"))
      .withColumn("running_max", max("cum_capital").over(byExit))
      .withColumn("drawdown", (col("cum_capital") - col("running_max")) / col("running_max"))
    val n = count(lit(1))
    val nd = n.cast("double")
    val s1 = decSumAgg(col("pnl_pct"))
    val s2 = decSumAgg(col("pnl_pct") * col("pnl_pct"))
    val variance = (s2 - s1 * s1 / nd) / nd
    val stdPop = sqrt(when(variance > 0.0, variance).otherwise(0.0))
    // pure sums are rounded in DECIMAL space (half-away ties match DuckDB's
    // ROUND-on-decimal); rounding the binary double diverges at exact ties
    def decRound4(c: org.apache.spark.sql.Column) = round(sum(dec(c)), 4).cast("double")
    val totalReturn = decRound4(col("pnl"))
    val grossProfit = decRound4(when(col("pnl") > 0, col("pnl")).otherwise(0.0))
    val grossLoss = abs(decRound4(when(col("pnl") < 0, col("pnl")).otherwise(0.0)))
    cum.groupBy("trade_strategy").agg(
      n.as("total_trades"),
      sum(when(col("pnl") > 0, 1L).otherwise(0L)).as("winning_trades"),
      sum(when(col("pnl") <= 0, 1L).otherwise(0L)).as("losing_trades"),
      (sum(when(col("pnl") > 0, 1L).otherwise(0L)) / nd * 100.0).as("win_rate"),
      totalReturn.as("total_return"),
      (totalReturn / initialCapital * 100.0).as("total_return_pct"),
      (totalReturn / nd).as("avg_trade_return"),
      (s1 / nd).as("avg_trade_return_pct"),
      (min("drawdown") * 100.0).as("max_drawdown"),
      when(n > 1 && stdPop =!= 0.0, (s1 / nd) / stdPop * math.sqrt(252.0))
        .otherwise(0.0).as("sharpe_ratio"),
      when(grossLoss =!= 0.0, grossProfit / grossLoss).otherwise(0.0).as("profit_factor"),
      (sum(col("holding_days")).cast("double") / nd).as("avg_holding_days"),
      decRound4(col("commission")).as("total_commission"),
      grossProfit.as("gross_profit"),
      grossLoss.as("gross_loss"))
  }
}
