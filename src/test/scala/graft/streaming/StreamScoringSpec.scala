package graft.streaming

import graft.SparkSpec
import graft.ml.TradeSuccess
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Continuous model scoring (stream_model_scoring): because the fitted
  * ensemble is a pure Column expression (TradeSuccess.scoreFrameExpr), the
  * streaming form must be a STATELESS projection — no state store, no
  * watermark — and must produce exactly the batch scores regardless of how
  * the feature rows are split across micro-batches. */
class StreamScoringSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  test("streamed codegen scoring ≡ batch scoring, stateless, across micro-batches") {
    val batch = TradeSuccess.scoringFrame(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-streamscore-spec").toString
    batch.repartition(3).write.mode("overwrite").parquet(tmp)
    val gbt = TradeSuccess.fitted(spark, dir).gbt
    val scored = TradeSuccess.scoreFrameExpr(gbt,
        spark.readStream.schema(batch.schema)
          .option("maxFilesPerTrigger", "1").parquet(tmp))
      .select(col("symbol_id"), col("date"),
        round(col("success_probability"), 6).as("p"))
    val q = scored.writeStream.format("memory").queryName("stream_scoring_spec")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val fed = q.recentProgress.filter(_.numInputRows > 0)
      assert(fed.length >= 2, s"expected multiple micro-batches, saw ${fed.length}")
      assert(fed.forall(_.stateOperators.isEmpty),
        "model scoring must not allocate streaming state")
    } finally q.stop()
    val got = spark.table("stream_scoring_spec")
    val want = TradeSuccess.scoreFrameExpr(gbt, batch)
      .select(col("symbol_id"), col("date"),
        round(col("success_probability"), 6).as("p"))
    assert(got.count() == batch.count(), "every arriving feature row must be scored")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
