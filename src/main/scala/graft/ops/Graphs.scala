package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Iterative graph fixpoints — the capability tier Spark itself lacks
  * (no recursive CTE): the loop lives in the driver as plan composition,
  * the data never leaves the executors.
  */
object Graphs {

  /** Transitive closure of an edge table by semi-naive (datalog)
    * evaluation: each round joins only the NEW pairs (the frontier)
    * against the edge table, so per-round shuffle traffic is the
    * frontier's size, not the whole closure's — the textbook bound, and
    * the difference between O(depth · closure) and O(depth · frontier)
    * at 100 TB. Pairs reachable by several paths keep their BFS-minimal
    * depth (the frontier is anti-joined against everything already
    * derived before it expands again).
    *
    * Each round TRUNCATES LINEAGE with an eager local checkpoint —
    * without it the accumulator's plan is a union-of-joins tree that
    * grows exponentially with depth (observed: 600+ exchanges in the
    * compiled plan by round 6), which is both a planner blow-up and a
    * recomputation bomb on executor loss. The emptiness probe (a count)
    * is the only thing the driver ever sees. A cluster deployment would
    * swap `localCheckpoint` for reliable `checkpoint` to survive
    * executor loss; the shape is identical. `maxIters` bounds runaway
    * cycles (cycles are fine semantically — anything already derived is
    * anti-joined away, so a cycle just stops producing new pairs).
    *
    * `edges` columns: (node, parent). Output: (node, ancestor, depth).
    */
  def transitiveClosure(edges: DataFrame, maxIters: Int = 30): DataFrame = {
    val e = edges.select(col("node"), col("parent")).persist()
    var acc = e.select(col("node"), col("parent").as("ancestor"), lit(1).as("depth"))
      .distinct().localCheckpoint(true)
    var frontier = acc
    var iter = 1
    var frontierSize = frontier.count()
    while (frontierSize > 0 && iter < maxIters) {
      val step = frontier
        .join(e.select(col("parent").as("next"), col("node").as("ancestor")), "ancestor")
        .select(col("node"), col("next").as("ancestor"), (col("depth") + 1).as("depth"))
        .distinct()
      val fresh = step.join(acc.select("node", "ancestor"), Seq("node", "ancestor"),
        "left_anti").localCheckpoint(true)
      acc = acc.unionByName(fresh).localCheckpoint(true)
      frontierSize = fresh.count()
      frontier = fresh
      iter += 1
    }
    e.unpersist()
    acc
  }
}
