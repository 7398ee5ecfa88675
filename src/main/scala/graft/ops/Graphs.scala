package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Iterative graph fixpoints — the capability tier Spark itself lacks
  * (no recursive CTE): the loop lives in the driver as plan composition,
  * the data never leaves the executors.
  */
object Graphs {

  /** Conf key (session-level) naming a RELIABLE checkpoint directory for
    * the fixpoint loops — the SAME key [[graft.exec.MigrationExecutor]]'s
    * write barrier honors, so one setting covers every checkpoint the
    * engine takes. The `GRAFT_CHECKPOINT_DIR` env var is the equivalent
    * process-level switch.
    */
  val CheckpointDirKey = "graft.checkpoint.dir"

  // last directory this process registered with setCheckpointDir — makes
  // the registration idempotent per configured value while still winning
  // over a checkpoint dir some earlier code path happened to set
  private val registeredDir = new java.util.concurrent.atomic.AtomicReference[String]()

  /** Per-round lineage truncation for driver-side fixpoint loops.
    *
    * Default: eager `localCheckpoint(true)` — correct and fast in local
    * mode, but local checkpoint blocks live on executors and die with
    * them, so on a real cluster an executor loss aborts the whole
    * iteration. Setting [[CheckpointDirKey]] (or `GRAFT_CHECKPOINT_DIR`)
    * to an HDFS/object-store path switches every loop to RELIABLE
    * `checkpoint()` — files survive executor loss, at the price of a
    * write+read per round. That price is the 1000-executor deployment's
    * insurance premium, and flipping it is configuration, not a code
    * edit. The SparkContext checkpoint dir is registered on first use
    * per configured value.
    */
  private[ops] def truncate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val dir = spark.conf.getOption(CheckpointDirKey)
      .orElse(sys.env.get("GRAFT_CHECKPOINT_DIR")).filter(_.nonEmpty)
    dir match {
      case Some(d) =>
        if (registeredDir.getAndSet(d) != d) spark.sparkContext.setCheckpointDir(d)
        df.checkpoint()
      case None => df.localCheckpoint(true)
    }
  }

  /** Round-scoped garbage collection for fixpoint checkpoints — reliable
    * checkpoint FILES and local-checkpoint BLOCKS both.
    *
    * `checkpoint()` files are never deleted by Spark itself
    * (`spark.cleaner.referenceTracking.cleanCheckpoints` defaults to
    * false, and relies on driver GC even when on) — so a fixpoint loop
    * that truncates every round would otherwise leave
    * O(rounds × |state|) bytes in the checkpoint dir for the life of
    * the directory. Each loop owns one of these: `track` records the
    * checkpoint file a `truncate` produced (no-op in local mode),
    * `sweep()` — called once per round AFTER the round's new
    * checkpoints have materialized (eager) — deletes the files recorded
    * before the previous sweep (a round-N checkpoint is last read while
    * materializing round N+1, so files are deleted exactly one sweep
    * after they are superseded), and `finish(keep)` deletes everything
    * still tracked except the returned frame's own files. Net: at most
    * two rounds of checkpoints live at any instant, one at exit.
    */
  private[ops] final class CheckpointGC {
    private var pending: List[String] = Nil // superseded at next sweep
    private var current: List[String] = Nil // created since last sweep
    // the LOCAL-checkpoint twin of the file lists: localCheckpoint(true)
    // pins its blocks in the block manager (that IS the checkpoint), and
    // nothing ever unpins a superseded round — the storage-accumulation
    // leak the r9 bench tail exposed. Same two-phase discipline: a
    // round-N checkpoint is last read while round N+1 materializes, so
    // its blocks are dropped one sweep after supersession.
    private var pendingRdds: List[org.apache.spark.rdd.RDD[_]] = Nil
    private var currentRdds: List[org.apache.spark.rdd.RDD[_]] = Nil

    private def rddOf(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }

    private def fileOf(df: DataFrame): Option[String] =
      df.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.getCheckpointFile
      }.flatten

    private def delete(spark: org.apache.spark.sql.SparkSession, paths: List[String]): Unit =
      paths.foreach { s =>
        try {
          val p = new org.apache.hadoop.fs.Path(s)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
          // best-effort cleanup: Path construction / FileSystem
          // resolution can throw RuntimeExceptions too (bad URI,
          // missing scheme) — none may abort a fixpoint loop whose
          // result is already computed
        } catch { case scala.util.control.NonFatal(_) => () }
      }

    def track(df: DataFrame): DataFrame = {
      fileOf(df).foreach(f => current ::= f)
      rddOf(df).filter(_.getStorageLevel.isValid).foreach(r => currentRdds ::= r)
      df
    }

    def sweep(spark: org.apache.spark.sql.SparkSession): Unit = {
      delete(spark, pending)
      pendingRdds.foreach(_.unpersist(blocking = false))
      pending = current
      current = Nil
      pendingRdds = currentRdds
      currentRdds = Nil
    }

    /** Immediate, targeted release of ONE tracked checkpoint the caller
      * can prove dead (r20 advice: the label-compression loop's inner
      * jumps — up to 40 per outer round — all stayed pinned until the
      * round's sweep, so peak storage was O(inner jumps × |labels|)).
      * Frees the frame's file/blocks now and drops them from the
      * tracked lists; everything else keeps the two-phase contract.
      */
    def release(spark: org.apache.spark.sql.SparkSession, df: DataFrame): Unit = {
      fileOf(df).foreach { p =>
        delete(spark, List(p))
        pending = pending.filterNot(_ == p)
        current = current.filterNot(_ == p)
      }
      rddOf(df).foreach { r =>
        r.unpersist(blocking = false)
        pendingRdds = pendingRdds.filterNot(_.id == r.id)
        currentRdds = currentRdds.filterNot(_.id == r.id)
      }
    }

    def finish(spark: org.apache.spark.sql.SparkSession, keep: DataFrame): Unit = {
      val keepFile = fileOf(keep)
      delete(spark, (pending ++ current).filterNot(keepFile.contains))
      val keepRdd = rddOf(keep).map(_.id)
      (pendingRdds ++ currentRdds).filterNot(r => keepRdd.contains(r.id))
        .foreach(_.unpersist(blocking = false))
      pending = Nil; current = Nil
      pendingRdds = Nil; currentRdds = Nil
    }
  }

  /** Transitive closure of an edge table by semi-naive (datalog)
    * evaluation: each round joins only the NEW pairs (the frontier)
    * against the edge table, so per-round shuffle traffic is the
    * frontier's size, not the whole closure's — the textbook bound, and
    * the difference between O(depth · closure) and O(depth · frontier)
    * at 100 TB. Pairs reachable by several paths keep their BFS-minimal
    * depth (the frontier is anti-joined against everything already
    * derived before it expands again).
    *
    * Each round TRUNCATES LINEAGE with an eager checkpoint ([[truncate]]
    * — local by default, RELIABLE under [[CheckpointDirKey]]) — without
    * it the accumulator's plan is a union-of-joins tree that grows
    * exponentially with depth (observed: 600+ exchanges in the compiled
    * plan by round 6), which is both a planner blow-up and a
    * recomputation bomb on executor loss. The emptiness probe (a count)
    * is the only thing the driver ever sees. `maxIters` bounds runaway
    * cycles (cycles are fine semantically — anything already derived is
    * anti-joined away, so a cycle just stops producing new pairs).
    *
    * `edges` columns: (node, parent). Output: (node, ancestor, depth).
    */
  def transitiveClosure(
      edges: DataFrame, maxIters: Int = 30, strict: Boolean = true): DataFrame = {
    val spark = edges.sparkSession
    val gc = new CheckpointGC
    val e = edges.select(col("node"), col("parent")).persist()
    var acc = gc.track(truncate(
      e.select(col("node"), col("parent").as("ancestor"), lit(1).as("depth"))
        .distinct()))
    var frontier = acc
    var rounds = 0
    var frontierSize = frontier.count()
    while (frontierSize > 0 && rounds < maxIters) {
      val step = frontier
        .join(e.select(col("parent").as("next"), col("node").as("ancestor")), "ancestor")
        .select(col("node"), col("next").as("ancestor"), (col("depth") + 1).as("depth"))
        .distinct()
      val fresh = gc.track(truncate(
        step.join(acc.select("node", "ancestor"), Seq("node", "ancestor"), "left_anti")))
      acc = gc.track(truncate(acc.unionByName(fresh)))
      frontierSize = fresh.count()
      frontier = fresh
      rounds += 1
      gc.sweep(spark)
    }
    e.unpersist()
    gc.finish(spark, acc)
    if (frontierSize > 0) {
      // a silently truncated closure is a wrong answer, not a warning —
      // programmatic callers can't see stderr. strict=false opts into
      // best-effort (the partial closure IS correct up to its depth).
      val msg =
        s"Graphs.transitiveClosure: frontier still non-empty after $maxIters " +
          s"rounds ($frontierSize new pairs pending) — result is truncated at depth " +
          s"${maxIters + 1}. Raise maxIters (or pass strict = false for best-effort)."
      if (strict) throw new IllegalStateException(msg)
      else System.err.println(s"[graft] $msg")
    }
    acc
  }

  /** Single-source (or multi-source) cheapest paths by semi-naive
    * Bellman–Ford: each round relaxes only the FRONTIER — the nodes
    * whose tentative distance improved last round — against the edge
    * table, so per-round shuffle traffic is the frontier's size, not
    * the whole distance table's (the same datalog bound
    * [[transitiveClosure]] gets for reachability, here on the
    * (min, +) semiring). With non-negative integer weights the
    * fixpoint is the exact shortest-path distance regardless of
    * iteration order or partitioning — what makes an iterative
    * numeric algorithm SQL-oracle-able bit-for-bit.
    *
    * Per round: one join of the frontier with the edge list (edges
    * persisted once, their partitioning reused every round), one
    * src-keyed partial-agg min shuffle, one merge-min against the
    * accumulated distances. Lineage is truncated per round and
    * checkpoints are GC'd two-phase, exactly like the other fixpoints;
    * `maxIters` bounds runaway relaxation (a negative cycle, or a
    * graph deeper than expected) and `strict` escalates truncation to
    * an error — a silently unconverged distance table is a wrong
    * answer, not a warning.
    *
    * `edges` columns: (src, dst, w) — w a non-negative long; distances
    * flow from `sources` (node) BACKWARD along edges (dist(src) =
    * min over src→dst of w + dist(dst)), the to-sink orientation;
    * callers wanting from-source semantics pass reversed edges.
    * Output: (node, dist) for every node that can reach a source.
    */
  def cheapestPaths(
      edges: DataFrame, sources: DataFrame, maxIters: Int = 40,
      strict: Boolean = true): DataFrame =
    relaxFixpoint(edges, sources, init = lit(0L),
      combine = (w, d) => w + d, better = (cand, cur) => cand < cur,
      merge = c => min(c), maxIters, strict, op = "cheapestPaths")

  /** Widest (maximum-bottleneck) paths: the (max, min) semiring
    * instance of the same semi-naive relaxation — width(node) = max
    * over node→dst edges of min(w, width(dst)), sources start at
    * Long.MaxValue (unconstrained). The capacity-planning twin of
    * [[cheapestPaths]]: "what is the largest flow unit this node can
    * push to the sink". Converges on any graph with finite widths
    * (relaxation is monotone non-decreasing and bounded).
    */
  def widestPaths(
      edges: DataFrame, sources: DataFrame, maxIters: Int = 40,
      strict: Boolean = true): DataFrame =
    relaxFixpoint(edges, sources, init = lit(Long.MaxValue),
      combine = (w, d) => least(w, d), better = (cand, cur) => cand > cur,
      merge = c => max(c), maxIters, strict, op = "widestPaths")

  /** The shared semi-naive relaxation engine behind [[cheapestPaths]]
    * and [[widestPaths]]: a path semiring plugs in as (combine = edge ⊗
    * distance, merge = ⊕ aggregate, better = strict ⊕-improvement).
    * Correct for any semiring whose relaxation is monotone and bounded
    * (min/+ with non-negative weights, max/min with finite widths) —
    * the frontier-only shuffle bound and the per-round checkpoint GC
    * are semiring-independent.
    */
  private def relaxFixpoint(
      edges: DataFrame, sources: DataFrame, init: org.apache.spark.sql.Column,
      combine: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
      better: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
      merge: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      maxIters: Int, strict: Boolean, op: String): DataFrame = {
    val spark = edges.sparkSession
    val gc = new CheckpointGC
    val e = edges.select(col("src"), col("dst"), col("w")).persist()
    var acc = gc.track(truncate(
      sources.select(col("node"), init.as("dist")).distinct()))
    var frontier = acc
    var rounds = 0
    var frontierSize = frontier.count()
    while (frontierSize > 0 && rounds < maxIters) {
      val cand = e
        .join(frontier.select(col("node").as("dst"), col("dist")), "dst")
        .select(col("src").as("node"), combine(col("w"), col("dist")).as("cand"))
        .groupBy(col("node")).agg(merge(col("cand")).as("cand"))
      val improved = gc.track(truncate(
        cand.join(acc, Seq("node"), "left")
          .filter(col("dist").isNull || better(col("cand"), col("dist")))
          .select(col("node"), col("cand").as("dist"))))
      // improved strictly beats acc where both exist, so merging is a
      // replace; one union + ⊕-agg keeps it a single shuffle
      acc = gc.track(truncate(
        acc.unionByName(improved).groupBy(col("node"))
          .agg(merge(col("dist")).as("dist"))))
      frontierSize = improved.count()
      frontier = improved
      rounds += 1
      gc.sweep(spark)
    }
    e.unpersist()
    gc.finish(spark, acc)
    if (frontierSize > 0) {
      val msg =
        s"Graphs.$op: distances still improving after $maxIters " +
          s"rounds ($frontierSize nodes pending) — unconverged (graph deeper " +
          "than maxIters, or an unbounded relaxation, e.g. a negative-weight " +
          "cycle under min/+). Raise maxIters (or pass strict = false for " +
          "best-effort)."
      if (strict) throw new IllegalStateException(msg)
      else System.err.println(s"[graft] $msg")
    }
    acc
  }

  /** k-core decomposition by iterative peeling: repeatedly delete every
    * node whose degree in the SURVIVING subgraph is below k, until a
    * whole round deletes nothing — the standard bulk-synchronous
    * formulation, and the third driver-side fixpoint shape next to the
    * semi-naive relaxations (those shuffle a shrinking FRONTIER; peeling
    * re-aggregates the shrinking SURVIVOR edge set, because a removal
    * changes its neighbors' degrees, and converges in O(peel-depth)
    * rounds — a structural property of the graph, not its size).
    * Per round: one degree aggregation (map-side combined) + two
    * semi-joins of the edge list against the survivor set; lineage is
    * truncated per round and checkpoints GC'd two-phase like every
    * other fixpoint here. Everything is exact integer counting — any
    * engine peels to the identical core.
    *
    * `edges` columns: (a, b) — canonical undirected (one row per edge,
    * a < b, no self-loops; the caller canonicalizes). Output:
    * (node, degree) for every k-core member, degree measured INSIDE
    * the core.
    */
  def kCore(
      edges: DataFrame, k: Int, maxIters: Int = 30,
      strict: Boolean = true): DataFrame = {
    val spark = edges.sparkSession
    val gc = new CheckpointGC
    var e = gc.track(truncate(edges.select(col("a"), col("b")).distinct()))
    var edgeCount = e.count()
    var removed = if (edgeCount > 0) 1L else 0L
    var rounds = 0
    while (removed > 0 && rounds < maxIters) {
      val survivors = e.select(col("a").as("u"))
        .unionByName(e.select(col("b").as("u")))
        .groupBy(col("u")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("u"))
      val next = gc.track(truncate(
        e.join(survivors.withColumnRenamed("u", "a"), Seq("a"), "left_semi")
          .join(survivors.withColumnRenamed("u", "b"), Seq("b"), "left_semi")
          .select(col("a"), col("b"))))
      val nextCount = next.count()
      removed = edgeCount - nextCount
      edgeCount = nextCount
      e = next
      rounds += 1
      gc.sweep(spark)
    }
    gc.finish(spark, e)
    if (removed > 0) {
      val msg =
        s"Graphs.kCore: still peeling after $maxIters rounds ($removed edges " +
          "removed in the last round) — result is NOT the k-core yet. Raise " +
          "maxIters (or pass strict = false for best-effort)."
      if (strict) throw new IllegalStateException(msg)
      else System.err.println(s"[graft] $msg")
    }
    e.select(col("a").as("node")).unionByName(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
  }

  /** Fixed-iteration PageRank in INTEGER micro-units (rank 1.0 =
    * 1,000,000): every step is integer division and integer sums, so the
    * result is bit-identical on any engine and any aggregation order —
    * what lets an iterative float-y algorithm carry an exact SQL oracle.
    * Update rule: r' = 0.15 + 0.85 · Σ (r_in div out_deg), all in
    * micro-units with floor division (documented, deterministic
    * truncation). Overflow bound: 850000 · Σ ranks must stay under 2^63
    * — fine below ~10^12 total rank micro-units; past that, scale ranks
    * down or widen to decimal.
    *
    * Scale shape per round: one join of the rank table with the edge
    * list (both partitioned by the join key; edges dominate and their
    * partitioning is reusable every round), one dst-keyed partial-agg
    * shuffle, one left join back to the node set. Lineage is truncated
    * per round like [[transitiveClosure]]. Dangling nodes (no
    * out-edges) simply contribute nothing — the simplified formulation.
    *
    * `edges` columns: (src, dst). Output: (node, rank) for all nodes.
    */
  def pageRankInt(edges: DataFrame, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val gc = new CheckpointGC
    val e = edges.select(col("src"), col("dst")).persist()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().persist()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg")).persist()
    var ranks = nodes.select(col("node"), lit(1000000L).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("node"), expr("rank div out_deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_sum"))
      ranks = gc.track(truncate(nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) +
            expr("850000 * coalesce(in_sum, 0L) div 1000000")).as("rank"))))
      gc.sweep(spark)
    }
    e.unpersist(); nodes.unpersist(); deg.unpersist()
    gc.finish(spark, ranks)
    ranks
  }
}
