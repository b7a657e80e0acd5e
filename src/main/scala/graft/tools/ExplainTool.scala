package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the executed plan of a named SparkEntry query —
  * the .explain feedback loop for shuffle/reuse/pushdown iteration. */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.count() // execute so AQE finalizes, without buffering rows on the driver
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
