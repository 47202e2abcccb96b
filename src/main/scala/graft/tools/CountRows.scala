package graft.tools
import org.apache.spark.sql.SparkSession
/** Row-count probe for scale analysis: runMain graft.tools.CountRows
  * <sfDir> <q1,q2,...> — prints name=rowcount, one per line. */
object CountRows {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    names.split(",").foreach { n =>
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(s"$n=$c sec=${(System.nanoTime()-t0)/1e9}")
    }
    spark.stop()
  }
}
