package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility (optimization rounds): dump `.explain("formatted")` for a
  * list of SparkEntry queries to `<outDir>/<query>_<tag>.txt` — the
  * plan-evidence files the optimization judge diffs (plans/r15/...).
  *
  * Usage: runMain graft.tools.PlanDump <tag> <outDir> q17_ngram_jaccard,...
  * Optional 4th arg: sfDir (default graded sf0.1). Plans are the static
  * optimized physical plans (pre-AQE), which is what the shape claims
  * (Exchange count, join strategy, PushedFilters) are about.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val outDir = java.nio.file.Path.of(args(1))
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${name}_$tag.txt"), txt)
      println(s"wrote ${name}_$tag.txt (${txt.linesIterator.length} lines)")
    }
    spark.stop()
  }
}
