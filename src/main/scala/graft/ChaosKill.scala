package graft

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Graph, Pin}

/** Executor-loss chaos proof for the checkpoint modes (round 10, the
  * property [[graft.ops.Pin]] exists for but had never exercised):
  * under a `local-cluster[...]` master with REAL executor JVMs, run an
  * iterative kernel, `kill -9` one executor mid-fixed-point, and
  * compare the output to an unkilled baseline run.
  *
  *  - mode=reliable (`spark.graft.checkpoint.dir` set): the kill must
  *    NOT matter — lost tasks recompute from the shared-filesystem
  *    checkpoint files and the job completes bit-identical.
  *  - mode=local (the localCheckpoint default): the kernel's pinned
  *    frames live only in executor block stores, so the kill makes the
  *    lineage unrecoverable and the job MUST fail — the negative
  *    control proving the experiment actually bites (a pass here would
  *    mean the kill missed).
  *
  * Usage (see tools/chaos_kill.sh for the full lane):
  *   SPARK_GRAFT_MASTER='local-cluster[2,4,3072]' \
  *   java ... graft.ChaosKill <sfDir> <reliable|local> [iterations] [pr|cc]
  *
  * Prints ONE JSON line:
  *   {"mode":..,"baselineSec":..,"killedSec":..,"completed":..,
  *    "hashMatch":..,"killedPid":..,"rows":..,"error":..}
  *
  * The workload is [[Graph.pageRank]] over the q99 trade graph
  * (customer⇄supplier, supplier ids offset by 2^40) with enough
  * iterations that the kill lands mid-fixed-point (timed at 40% of the
  * measured baseline wall). The kill targets only THIS app's executors
  * (command line filtered on the application id), so a concurrent lane
  * on the same host is never collateral.
  */
object ChaosKill {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = args(1)
    require(mode == "reliable" || mode == "local",
      s"mode must be reliable|local, got $mode")
    val iterations = args.lift(2).map(_.toInt).getOrElse(20)
    // pr = PageRank (fixed-width fixed point); cc = connected
    // components (pointer jumping + per-round block cleanup — a
    // DIFFERENT pin/unpersist pattern worth its own kill)
    val kernel = args.lift(3).getOrElse("pr")
    require(kernel == "pr" || kernel == "cc",
      s"kernel must be pr|cc, got $kernel")

    val master =
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,4,3072]")
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (mode == "reliable")
      spark.conf.set(Pin.DirConf,
        sys.env.getOrElse("SPARK_GRAFT_CKPT", "/tmp/graft_ckpt_chaos"))

    val appId = spark.sparkContext.applicationId

    // q99's trade graph (GraphQueries.scala): symmetrized
    // customer⇄supplier edges, disjoint id spaces via the 2^40 offset
    def rank(): (Long, String) = {
      import graft.Tables.t
      val li = t(spark, sfDir, "lineitem")
      val orders = t(spark, sfDir, "orders")
      val base = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
        .distinct()
      val edges = base
        .select(col("cust").as("src"), (col("supp") + 1099511627776L).as("dst"))
        .unionByName(base
          .select((col("supp") + 1099511627776L).as("src"), col("cust").as("dst")))
      val out =
        if (kernel == "cc")
          graft.ops.Dedup.connectedComponents(
              edges.select(col("src").as("a_id"), col("dst").as("b_id")))
            .orderBy(col("id"))
        else Graph.pageRank(edges, "src", "dst", iterations,
            assumeSimple = true)
          .orderBy(col("node"))
      val rows = out.collect()
      val md = MessageDigest.getInstance("SHA-256")
      rows.foreach(r => md.update(r.toString.getBytes("UTF-8")))
      (rows.length.toLong, md.digest().map("%02x".format(_)).mkString)
    }

    // The kill is placed by STAGE COUNT, not wall-clock: the first
    // (cold) run pays parquet-footer/codegen/broadcast warmup that the
    // second doesn't, so a timer calibrated on the baseline can fire
    // after the warm killed run already finished — a silent no-op
    // "proof". Counting baseline stages and killing when the killed
    // run completes half as many lands the kill mid-fixed-point
    // deterministically; the verdict additionally REQUIRES the kill to
    // have happened while the run was in flight.
    val stagesSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val killAt = new java.util.concurrent.atomic.AtomicInteger(Int.MaxValue)
    val killedPid = new java.util.concurrent.atomic.AtomicLong(-1L)
    val killNanos = new java.util.concurrent.atomic.AtomicLong(-1L)
    def killOneExecutor(): Unit = {
      val victim = ProcessHandle.allProcesses()
        .filter(p => p.info().commandLine().map[Boolean](c =>
          c.contains("CoarseGrainedExecutorBackend") && c.contains(appId))
          .orElse(false))
        .findFirst()
      victim.ifPresent { p =>
        killedPid.set(p.pid())
        killNanos.set(System.nanoTime())
        p.destroyForcibly()
        ()
      }
    }
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          if (stagesSeen.incrementAndGet() == killAt.get())
            new Thread(() => killOneExecutor()) { setDaemon(true); start() }
      })

    // ---- baseline (unkilled; also counts the workload's stages) ----
    val t0 = System.nanoTime()
    val (baseRows, baseHash) = rank()
    val baselineSec = (System.nanoTime() - t0) / 1e9
    val baselineStages = stagesSeen.get()

    // ---- killed run: arm the listener at half the baseline's stages ----
    stagesSeen.set(0)
    killAt.set((baselineStages / 2).max(1))
    val t1 = System.nanoTime()
    val outcome =
      try Right(rank())
      catch { case e: Throwable => Left(e) }
    val endNanos = System.nanoTime()
    val killedSec = (endNanos - t1) / 1e9
    val killedDuringRun =
      killNanos.get() > t1 && killNanos.get() < endNanos

    def esc(s: String) =
      s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", " ")
    val (completed, hashMatch, rows, err) = outcome match {
      case Right((n, h)) => (true, h == baseHash, n, "")
      case Left(e) =>
        (false, false, 0L,
          s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(300)}")
    }
    // one machine-readable line for the lane script
    println(s"""{"mode":"$mode","kernel":"$kernel","master":"${esc(master)}",""" +
      s""""iterations":$iterations,"baselineSec":${"%.1f".format(baselineSec)},""" +
      s""""baselineStages":$baselineStages,"killAtStage":${killAt.get},""" +
      s""""killedSec":${"%.1f".format(killedSec)},"killedPid":${killedPid.get},""" +
      s""""killedDuringRun":$killedDuringRun,""" +
      s""""completed":$completed,"hashMatch":$hashMatch,"rows":$rows,""" +
      s""""baselineRows":$baseRows,"error":"${esc(err)}"}""")
    spark.stop()
    // exit code encodes the EXPECTED outcome per mode: reliable must
    // survive bit-identical, local must fail (the negative control) —
    // and in BOTH modes the kill must verifiably land mid-run, or the
    // experiment proved nothing
    val ok =
      if (mode == "reliable") completed && hashMatch && killedDuringRun
      else !completed && killedDuringRun
    sys.exit(if (ok) 0 else 1)
  }
}
