package graft.ops

import org.apache.spark.SparkContext
import org.apache.spark.sql.Dataset

/** Lineage pinning with a deployment-selectable durability mode.
  *
  * Every iterative kernel in this library (PageRank / connected
  * components / BPE merges / k-center / the range-prefix constructions)
  * materializes intermediate frames once and truncates their lineage so
  * deep fixed points don't accumulate an unbounded plan. On a single
  * JVM, `localCheckpoint` is exactly right: blocks pin in the
  * BlockManager at memory speed. On a REAL cluster it is a reliability
  * trap — a locally-checkpointed RDD lives only in its executors'
  * block stores, so one lost executor makes the lineage unrecoverable
  * and fails the whole multi-hour job (Spark logs exactly this:
  * "Checkpoint blocks ... found missing ... locally checkpointed
  * ... cannot be recomputed").
  *
  * [[pin]] therefore routes through the conf key
  * `spark.graft.checkpoint.dir`:
  *
  *  - unset/empty (the local-mode default): `localCheckpoint` —
  *    fastest, correct wherever executor loss implies job loss anyway.
  *  - set to an HDFS/S3/DBFS path (cluster deployments): reliable
  *    `Dataset.checkpoint()` — frames persist to the shared filesystem
  *    and survive executor loss; a lost task recomputes from the
  *    checkpoint files instead of dying. Costs one extra computation
  *    of the frame (the checkpoint job re-runs the RDD after the eager
  *    materialization) plus distributed-FS I/O — the standard price of
  *    fault tolerance for iterative Spark jobs.
  *
  * The checkpoint directory is installed on the SparkContext on first
  * use (per context+dir, so repeated pins don't spawn fresh UUID
  * subdirectories). Checkpoint files accumulate for the lifetime of the
  * job unless `spark.cleaner.referenceTracking.cleanCheckpoints=true`
  * lets the ContextCleaner reap them with their RDDs — set it in
  * cluster deployments (README "Cluster deployment" note). The
  * BlockManager-based cleanup some kernels do (getPersistentRDDs
  * diffing in [[Dedup.connectedComponents]]) degrades to a no-op in
  * reliable mode by construction: reliable checkpoints never enter the
  * block store.
  *
  * Both modes materialize the frame ONCE and freeze its rows —
  * anything derived from materialization order (`spark_partition_id`
  * in [[Stats.rangePrefixSums]]) is identical under either mode, which
  * CheckpointModeSpec pins by asserting bit-identical kernel outputs.
  */
object Pin {

  /** Conf key selecting reliable checkpointing; empty = localCheckpoint. */
  val DirConf = "spark.graft.checkpoint.dir"

  // remembers which (context, dir) pair already had setCheckpointDir
  // applied: setCheckpointDir mints a fresh UUID subdirectory per call,
  // so calling it per-pin would scatter files across directories
  @volatile private var applied: (SparkContext, String) = null

  /** Conf key enabling layout-aligned pinning (see [[pinAligned]]);
    * default resolved from the master type ([[defaultAligned]]). */
  val AlignConf = "spark.graft.pin.alignedLayout"

  /** Materialize `ds` eagerly and truncate its lineage — via
    * `localCheckpoint` (default) or reliable `checkpoint` when
    * `spark.graft.checkpoint.dir` is set. */
  def pin[T](ds: Dataset[T]): Dataset[T] = {
    val dir = ds.sparkSession.conf.get(DirConf, "")
    if (dir == null || dir.isEmpty) ds.localCheckpoint()
    else {
      val sc = ds.sparkSession.sparkContext
      if (applied == null || (applied._1 ne sc) || applied._2 != dir)
        Pin.synchronized {
          if (applied == null || (applied._1 ne sc) || applied._2 != dir) {
            sc.setCheckpointDir(dir)
            applied = (sc, dir)
          }
        }
      // Deliberately NOT persist-before-checkpoint (measured twice,
      // round 11): Spark's RDD.checkpoint Scaladoc recommends caching
      // so the checkpoint write job reads blocks instead of re-running
      // the lineage, but pricing MEMORY_AND_DISK-persist-then-unpersist
      // same-window showed it LOSES or ties everywhere we run — sf0.1
      // local[32] reliable: 1.15x total (q121/q99 1.59x — columnar
      // cache serialization swamps the cheap recompute; q99 even grew
      // shuffle bytes, the cached boundary blocks AQE); sf1
      // local-cluster[2,8] reliable: wall 0.84–1.12x ≈ noise with
      // strictly WORSE cpu on every query (q191 +28%, q121 +76%).
      // The double compute is real but cheaper than caching columnar
      // blocks it would avoid; revisit only with a storage level that
      // skips columnar serialization.
      ds.checkpoint()
    }
  }

  /** True when layout-aligned pinning is enabled on this session.
    * An explicit `spark.graft.pin.alignedLayout` conf always wins
    * (it's an unregistered key, so `getOption` is None exactly when
    * the user never set it); with no conf the default is resolved
    * from the master type by [[defaultAligned]]. */
  def aligned(sess: org.apache.spark.sql.SparkSession): Boolean =
    sess.conf.getOption(AlignConf) match {
      case Some(v) => v == "true"
      case None => defaultAligned(sess.sparkContext.isLocal)
    }

  /** Master-type default for aligned pinning, factored pure so the spec
    * can pin the rule: OFF for `local`/`local[*]` masters (in-process
    * shuffle is memory-speed — aligning costs AQE coalescing and buys
    * nothing, measured round 9), ON for everything else
    * (`local-cluster`, `spark://`, YARN, k8s — shuffle crosses a
    * process/network boundary, where the round-10 `local-cluster`
    * pricing showed aligned pinning wins BOTH wall (0.85–0.97×) and
    * shuffle bytes (0.64–0.86×) on the iterative graph kernels).
    * `SparkContext.isLocal` is exactly the local[*] predicate —
    * `local-cluster` masters report false. */
  def defaultAligned(masterIsLocal: Boolean): Boolean = !masterIsLocal

  /** Pin with a DECLARED join-key layout — the network-shuffle
    * deployment knob. When `spark.graft.pin.alignedLayout=true`, the
    * frame materializes repartitioned by `keys` with AQE scoped OFF for
    * just this eager job, because a checkpoint taken through an
    * `AdaptiveSparkPlan` reports `UnknownPartitioning` and FORGETS the
    * layout — with it preserved, every iteration of a fixed-point
    * kernel satisfies its join's clustering requirement straight from
    * the pinned frame instead of re-exchanging it per round.
    *
    * The default SELF-RESOLVES from the master type (round 11 —
    * [[defaultAligned]]): OFF under `local[*]`, ON under any
    * multi-process master. Both sides are measured (work channel,
    * BASELINE.md rounds 9–10): aligned pinning cuts the iterative
    * graph kernels' shuffle volume 25–45% at sf0.1 AND sf1 (PageRank
    * −466 MB at sf1), but on `local[*]` — where shuffle is
    * memory-speed and essentially free — wall time got WORSE
    * (fixed-width layouts block AQE partition coalescing in the round
    * jobs, and the pin job loses AQE's runtime broadcasts), so locally
    * the bytes saved buy nothing; under `local-cluster[2,8]` the knob
    * wins BOTH wall (0.85–0.97×) and bytes (0.64–0.86×). An explicit
    * `spark.graft.pin.alignedLayout` conf overrides the resolution in
    * either direction. Either setting is output-identical
    * (AlignedPinSpec). */
  def pinAligned[T](ds: Dataset[T], keys: org.apache.spark.sql.Column*)
      : Dataset[T] = {
    val sess = ds.sparkSession
    if (!aligned(sess)) pin(ds)
    else sess.synchronized {
      // synchronized on the session: the AQE toggle below is a
      // session-GLOBAL conf flip around an eager job, so a concurrent
      // pinAligned on the same session could restore AQE while this
      // pin is still materializing (silently losing the declared
      // layout) — serializing aligned pins per session closes that.
      // Queries running concurrently on OTHER threads of this session
      // still briefly plan without AQE; aligned pinning is a cluster
      // deployment knob, documented for single-query-at-a-time jobs.
      val aqeKey = "spark.sql.adaptive.enabled"
      // RuntimeConfig.getOption returns the REGISTERED default ("true")
      // even when the key was never explicitly set, so explicit-set
      // detection goes through SQLConf.contains via the bridge — else
      // the unset branch is unreachable and this method would pin an
      // explicit "true" into the session conf (round-10 ADVICE)
      val wasExplicit = org.apache.spark.sql.graftbridge.ColumnBridge
        .explicitlySet(sess, aqeKey)
      val prior = sess.conf.get(aqeKey, "true")
      val wasOn = prior == "true"
      if (wasOn) sess.conf.set(aqeKey, "false")
      try pin(ds.repartition(keys: _*))
      finally if (wasOn) {
        if (wasExplicit) sess.conf.set(aqeKey, prior)
        // key was at its default: restore by unsetting, not by pinning
        // an explicit "true" into the session conf
        else sess.conf.unset(aqeKey)
      }
    }
  }

  /** Postfix spelling, so kernels keep reading as plan pipelines:
    * `frame.join(...).distinct().pinned`. */
  implicit class PinSyntax[T](private val ds: Dataset[T]) extends AnyVal {
    def pinned: Dataset[T] = pin(ds)
    /** [[pinAligned]] postfix: `edges.pinnedBy(col("src"))`. */
    def pinnedBy(keys: org.apache.spark.sql.Column*): Dataset[T] =
      pinAligned(ds, keys: _*)
  }
}
