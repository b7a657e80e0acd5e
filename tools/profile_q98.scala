// Profile q98 source-overlap stages (spark-shell -i; dev tool, not shipped)
import org.apache.spark.sql.functions._

val dir = "/root/testdata/sf0.1"
def time[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  println(f"[prof] $label: ${(System.nanoTime - t0) / 1e9}%.3f s"); r
}
spark.range(1000000L).agg(sum("id")).collect

val q = graft.SparkEntry.queries("q98_source_overlap")
for (i <- 1 to 3) time(s"full q98 pass $i")(q(spark, dir).count)

val docs = graft.Tables.t(spark, dir, "documents")
val toks = filter(split(lower(trim(col("text"))), "\\s+"), w => length(w) > 0)
val grams = docs.select(col("source"),
  explode(graft.ops.Corpus.wordNgrams(toks, 3)).as("gram"))
time("gram explode only")(grams.count)
val bySource = grams.groupBy(col("gram"))
  .agg(array_sort(collect_set(col("source"))).as("ss"))
time("groupBy(gram) collect_set")(bySource.count)
val inter = bySource
  .select(explode(flatten(transform(col("ss"), (a, i) =>
    transform(slice(col("ss"), i + lit(2), size(col("ss"))),
      b => struct(a.as("source_a"), b.as("source_b")))))).as("p"))
  .groupBy(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
  .agg(count(lit(1)).as("n_shared"))
time("pair explode + agg")(inter.count)
time("full again")(q(spark, dir).count)
System.exit(0)
