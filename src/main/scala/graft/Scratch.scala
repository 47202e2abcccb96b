package graft

import org.apache.spark.sql.functions._
import graft.engine.Sessions
import graft.functions.{TextFns, VecFns}

// Temporary cross-engine primitive check (deleted before round end).
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(("hello world",
      Seq(1.25f, 2.5f, 0.1f), Seq(0.3f, 1.1f, 2.2f))).toDF("s", "a", "b")
    df.select(
      TextFns.polyHash(col("s")).as("ph"),
      VecFns.dot(col("a"), col("b")).as("dot"),
      TextFns.shingles(TextFns.tokens(lit("a b c d e")), 3).as("sh"),
      VecFns.lshBucket(col("a")).as("bucket"))
      .show(false)
    spark.stop()
  }
}
