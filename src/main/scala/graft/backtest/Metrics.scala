package graft.backtest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Strategy performance metrics (backtest_strategies.py:304-389): win rate,
  * total/avg returns, max drawdown (running cumulative-capital peak over
  * exit-date order), annualized Sharpe (population std, √252), profit
  * factor, holding/commission stats.
  *
  * Drawdown needs a per-strategy cumulative scan — windows partition by
  * strategy (trades per strategy are already the small output of the
  * simulation, so this never becomes a global single-partition pass over
  * raw data). */
object Metrics {
  def perStrategy(trades: DataFrame,
                  initialCapital: Double = Simulator.InitialCapital): DataFrame = {
    val byExit = Window.partitionBy("trade_strategy")
      .orderBy("exit_date", "symbol_id", "entry_date")
    val cum = trades
      .withColumn("cum_pnl", sum("pnl").over(byExit))
      .withColumn("cum_capital", lit(initialCapital) + col("cum_pnl"))
      .withColumn("running_max", max("cum_capital").over(byExit))
      .withColumn("drawdown", (col("cum_capital") - col("running_max")) / col("running_max"))
    cum.groupBy("trade_strategy").agg(
      count(lit(1)).as("total_trades"),
      sum(when(col("pnl") > 0, 1L).otherwise(0L)).as("winning_trades"),
      sum(when(col("pnl") <= 0, 1L).otherwise(0L)).as("losing_trades"),
      (sum(when(col("pnl") > 0, 1L).otherwise(0L)) / count(lit(1)).cast("double") * 100.0).as("win_rate"),
      sum("pnl").as("total_return"),
      (sum("pnl") / initialCapital * 100.0).as("total_return_pct"),
      avg("pnl").as("avg_trade_return"),
      avg("pnl_pct").as("avg_trade_return_pct"),
      (min("drawdown") * 100.0).as("max_drawdown"),
      when(count(lit(1)) > 1 && stddev_pop("pnl_pct") =!= 0.0,
        avg("pnl_pct") / stddev_pop("pnl_pct") * math.sqrt(252.0)).otherwise(0.0).as("sharpe_ratio"),
      when(abs(sum(when(col("pnl") < 0, col("pnl")).otherwise(0.0))) =!= 0.0,
        sum(when(col("pnl") > 0, col("pnl")).otherwise(0.0)) /
          abs(sum(when(col("pnl") < 0, col("pnl")).otherwise(0.0)))).otherwise(0.0).as("profit_factor"),
      avg("holding_days").as("avg_holding_days"),
      sum("commission").as("total_commission"),
      sum(when(col("pnl") > 0, col("pnl")).otherwise(0.0)).as("gross_profit"),
      abs(sum(when(col("pnl") < 0, col("pnl")).otherwise(0.0))).as("gross_loss"))
  }
}
