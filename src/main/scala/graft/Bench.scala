package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** The graded SF dir — the ONE constant behind both the
    * SPARK_GRAFT_SF_DIR default and the "is this a full default run"
    * artifact-path decision below; two separate literals once let a
    * trailing slash reroute a genuine full run to the /tmp sidecar. */
  val DefaultSfDir = "/root/testdata/sf0.1"
  private def canon(p: String): java.nio.file.Path =
    java.nio.file.Path.of(p).toAbsolutePath.normalize

  /** The snapshot-survivable summary line: COMPLETE inside any
    * 2000-char stdout tail (the round driver keeps only that much, and
    * the full per-query line is ~6 KB at 223 queries). Budget is pinned
    * at ≤ [[CompactLineBudget]] chars by BenchLineSpec over the REAL
    * query-name surface, so a growing surface (8 slowest × long names)
    * cannot silently push the one readable record out of the window.
    * Locale.ROOT throughout — a comma-decimal host must not emit
    * invalid JSON in exactly the line built to stay machine-parseable. */
  val CompactLineBudget = 700
  def compactLine(total: Double, sfDir: String, nQueries: Int, nOk: Int,
      nErrors: Int, memSpill: Long, diskSpill: Long,
      slowest: Seq[(String, Double)]): String = {
    val slowJson = slowest
      .map { case (k, v) =>
        "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.2f",
          Double.box(v))
      }.mkString("{", ",", "}")
    // distinct metric key vs the full line's "total": two stdout lines
    // sharing "metric":"total" with different schemas let a key-matching
    // consumer nondeterministically pick either shape
    s"""{"metric":"total_compact","value":$total,"unit":"sec","sf":"$sfDir",""" +
      s""""nQueries":$nQueries,"nOk":$nOk,"nErrors":$nErrors,""" +
      s""""spill":{"memBytes":$memSpill,"diskBytes":$diskSpill},""" +
      s""""slowest":$slowJson,"perQueryArtifact":"BENCH_full_latest.json"}"""
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", DefaultSfDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // best-of-n per query: a single pass is hostage to transient external
    // load (round 1's driver bench ran 3× inflated under a loaded host);
    // the min of n passes is the machine-capability number
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    // SPARK_GRAFT_MASTER: same cluster-rehearsal override as Verify's —
    // lets the lane price the surface under local-cluster[...] with
    // real executor processes and network-path shuffle.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      // static conf, so it must ride the builder: the default 100-entry
      // whole-stage-codegen class cache thrashes across this surface's
      // 227 queries × dozens of unique stages, so every best-of-n pass
      // re-runs janino on every stage (~50-300 ms each) — a fixed
      // driver-side tax the guide's §1.2 step-2 bucket. Sized to hold
      // the whole surface's generated classes; scale-independent (the
      // cache is per-JVM and keyed on generated source, and executors
      // at cluster scale benefit identically).
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "10000"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional session-conf overrides for benching deployment knobs,
    // e.g. SPARK_GRAFT_CONF=spark.graft.pin.alignedLayout=true.
    // Pairs split on ';' when one is present, else ',' — so a
    // list-valued conf ("k=a,b,c") passes intact by switching to ';'
    // as the pair delimiter. A segment with no '=' is a malformed
    // pair: warn loudly instead of dropping it silently.
    sys.env.get("SPARK_GRAFT_CONF").foreach { raw =>
      val sep = if (raw.contains(';')) ';' else ','
      raw.split(sep).filter(_.trim.nonEmpty).foreach { kv =>
        val i = kv.indexOf('=')
        if (i > 0) spark.conf.set(kv.take(i).trim, kv.drop(i + 1).trim)
        else System.err.println(
          s"[bench] WARN: SPARK_GRAFT_CONF segment '$kv' has no '=' — " +
            "ignored (use ';' between pairs when a value contains ',')")
      }
    }
    // spill accounting (round-9 memory-pressure lane): task-level
    // memory/disk spill totals across the whole run, reported in the
    // JSON line — a constrained-heap pass (e.g. -Xmx8g at sf1) proves
    // graceful spill exactly when these are nonzero AND errors is empty
    val memSpill = new java.util.concurrent.atomic.AtomicLong()
    val diskSpill = new java.util.concurrent.atomic.AtomicLong()
    // WORK channel (round 9): cumulative task-level shuffle bytes, CPU
    // time, and task counts. Unlike wall-clock — which this host moves
    // by ±20% per query between same-window passes (see BASELINE.md's
    // A/A calibration) — shuffle volume is a deterministic property of
    // the physical plan over fixed input, so per-query deltas of these
    // counters decide "did this change add or remove work" exactly,
    // where a timing diff can only shrug. Sliced per query by
    // snapshotting around each run with the listener bus drained
    // (events are async; without the drain a query's tail lands on the
    // next query's account).
    val shufRead = new java.util.concurrent.atomic.AtomicLong()
    val shufWrite = new java.util.concurrent.atomic.AtomicLong()
    val cpuNs = new java.util.concurrent.atomic.AtomicLong()
    val nTasks = new java.util.concurrent.atomic.AtomicLong()
    // failed/killed task ends land in the SAME metrics stream: a stage
    // retry re-reads its shuffle input, so a query's byte counters can
    // inflate over the plan-deterministic value for execution (not
    // plan) reasons. Counting them separately lets a work-channel diff
    // distinguish "the plan changed" from "tasks were retried in this
    // window" (round 11: a full sf1 run showed q61 +25 MB that three
    // identical-prefix partial runs did not reproduce). Only ends whose
    // REASON implies a re-execution count (TaskFailedReason that the
    // scheduler resubmits) — a TaskKilled from speculative execution or
    // an intentional job cancel does not inflate any byte counter, and
    // counting it would make bench_compare's "[retried N task(s)]"
    // annotation fire on runs with no retry-driven inflation
    // (round-11 ADVICE).
    val nFailed = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          t.reason match {
            case _: org.apache.spark.TaskKilled => () // speculation/cancel
            case org.apache.spark.Success => ()
            case _ => nFailed.incrementAndGet() // failed → will be retried
          }
          if (m != null) {
            memSpill.addAndGet(m.memoryBytesSpilled)
            diskSpill.addAndGet(m.diskBytesSpilled)
            shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            cpuNs.addAndGet(m.executorCpuTime)
            nTasks.incrementAndGet()
          }
        }
      })
    // untimed warmup: JVM/codegen/Hadoop-FS init, not query work
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet")
      .write.format("noop").mode("overwrite").save()
    // optional comma-separated query-name filter for local iteration
    // (e.g. SPARK_GRAFT_BENCH_ONLY=q16_simhash,q17_ngram_jaccard)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq
      .filter(n => only.forall(_.contains(n)))
    // only successful runs produce a timing sample — a query that throws
    // must NOT contribute its time-to-exception as a valid (fast) min,
    // or a regression that breaks a query silently improves the total
    val best = scala.collection.mutable.Map[String, Double]()
    val errors = scala.collection.mutable.Map[String, String]()
    // per-query WORK from the last successful run (plan-deterministic,
    // so any run's numbers are THE numbers; the last overwrite keeps
    // the code a counter diff, no min-tracking)
    val work = scala.collection.mutable.Map[String, (Long, Long, Long, Long, Long)]()
    def drain(): Unit =
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
    for (_ <- 1 to runs; name <- names) {
      val fn = SparkEntry.queries(name)
      drain()
      val (r0, w0, c0, k0, f0) =
        (shufRead.get, shufWrite.get, cpuNs.get, nTasks.get, nFailed.get)
      val t0 = System.nanoTime()
      try {
        // harness v2: materialize EVERY output column via a noop-format
        // write. Under the old `count()`, Catalyst's ColumnPruning dropped
        // unreferenced projections and EliminateSorts removed trailing
        // ORDER BYs, so map-only expression-kernel queries were priced as
        // parquet row-counts (q54 html-strip: 0.13s counted vs 1.08s real).
        // The noop sink consumes each InternalRow and discards it — full
        // query work, zero I/O cost in the measurement.
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec < best.getOrElse(name, Double.MaxValue)) best(name) = sec
        drain()
        work(name) = (shufRead.get - r0, shufWrite.get - w0,
          cpuNs.get - c0, nTasks.get - k0, nFailed.get - f0)
      } catch {
        case e: Throwable =>
          errors(name) = e.getClass.getName
          // the JSON line carries only the class name (stable, short);
          // the WHY goes to stderr — a swallowed root cause turns every
          // at-scale failure into a blind reproduction hunt
          System.err.println(s"BENCH ERROR $name: $e")
          e.getStackTrace.take(12).foreach(f => System.err.println(s"    at $f"))
          // identity-set guard: a cycle longer than a direct self-link
          // (A→B→A) must not hang the error handler mid-bench
          val seen = java.util.Collections.newSetFromMap(
            new java.util.IdentityHashMap[Throwable, java.lang.Boolean]())
          seen.add(e)
          var cause = e.getCause
          while (cause != null && seen.add(cause)) {
            System.err.println(s"  caused by: $cause")
            cause.getStackTrace.take(6).foreach(f => System.err.println(s"    at $f"))
            cause = cause.getCause
          }
      }
    }
    // a query with no successful run reports -1 and an error marker
    val qs = names.map(k => s"\"" + k + "\":" + best.getOrElse(k, -1.0)).mkString("{", ",", "}")
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    val total = names.flatMap(best.get).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,""" +
        s""""spill":{"memBytes":${memSpill.get},"diskBytes":${diskSpill.get}},"sf":"$sfDir"}"""
    println(line)
    // The round driver's BENCH_r*.json snapshot keeps only the LAST
    // 2000 chars of stdout, and the full line above is ~6 KB at 223
    // queries — so the snapshot's head (and the opening brace) is cut
    // and the snapshot has recorded `parsed: null` since round 7. The
    // full line stays first (it IS the documented contract, and a
    // driver that captures unbounded stdout parses it); this second,
    // ≤ ~700-char line is COMPLETE inside any 2000-char tail: the
    // headline numbers, the 8 slowest queries, and the path of the
    // committed artifact holding the untruncated per-query record.
    val slowest = names.flatMap(k => best.get(k).map(k -> _))
      .sortBy(-_._2).take(8)
    println(compactLine(total, sfDir, names.size, best.size, errors.size,
      memSpill.get, diskSpill.get, slowest))
    // the deterministic work channel goes in the ARTIFACT only: the
    // round driver keeps a 2000-char truncated tail of stdout, and
    // bloating the line would push the per-query timings out of it
    val workJson = names.flatMap(k => work.get(k).map { case (r, w, c, t, f) =>
      "\"" + k + "\":" +
        s"""{"shuffleReadBytes":$r,"shuffleWriteBytes":$w,"cpuNs":$c,"tasks":$t,"failedTasks":$f}"""
    }).mkString("{", ",", "}")
    // stable full artifact: the round driver's BENCH_r*.json keeps only
    // a 2000-char truncated tail of stdout, so the complete per-query
    // record must live at a fixed path the next round can diff against
    // (tools/bench_compare.py defaults its `new` side to this file)
    // default resolves against the repo root (first ancestor of the cwd
    // holding build.sbt), not the raw cwd: a run launched from another
    // directory must not leave a stale artifact in place for
    // tools/bench_compare.py to silently diff as "no regression"
    // The default path guards itself against dev-run clobber (learned
    // the hard way in round 10: a /verify sf0.01 smoke pass silently
    // overwrote the graded sf0.1 artifact, and the clobber rode a
    // commit): without an explicit SPARK_GRAFT_BENCH_OUT, the artifact
    // is only written for a FULL default-SF run — a filtered
    // (BENCH_ONLY) or non-default-SF pass records to a /tmp sidecar
    // instead, so bench_compare.py never diffs apples against oranges.
    val defaultFullRun =
      canon(sfDir) == canon(DefaultSfDir) &&
        sys.env.get("SPARK_GRAFT_BENCH_ONLY").isEmpty
    val outPath = sys.env.get("SPARK_GRAFT_BENCH_OUT")
      .map(java.nio.file.Path.of(_))
      .getOrElse {
        if (!defaultFullRun)
          java.nio.file.Path.of("/tmp/bench_partial_latest.json")
        else {
          var d = java.nio.file.Path.of("").toAbsolutePath
          while (d != null && !java.nio.file.Files.exists(d.resolve("build.sbt")))
            d = d.getParent
          (if (d == null) java.nio.file.Path.of("").toAbsolutePath else d)
            .resolve("BENCH_full_latest.json")
        }
      }
    val artifactLine = line.stripSuffix("}") + s""","work":$workJson}"""
    try java.nio.file.Files.writeString(outPath, artifactLine + "\n")
    catch { case e: Exception =>
      // a read-only target must not fail the bench, but it must be LOUD:
      // a swallowed failure leaves the previous artifact masquerading
      // as this run's result
      System.err.println(
        s"WARNING: bench artifact write failed ($outPath): $e — " +
          "per-query record for this run exists only on stdout")
    }
    spark.stop()
  }
}
