package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact distributed rank/ntile: the replacement for single-partition
  * global windows must (a) match the sequential answer exactly on any
  * partitioning, (b) reproduce SQL NTILE's fat-bucket-first sizing, and
  * (c) never plan a SinglePartition exchange — that absence is the
  * entire point of the operator.
  */
class RankSpec extends SparkSpec {
  import spark.implicits._

  test("rankGlobal matches the sequential rank on a shuffled input") {
    val n = 1000
    val data = scala.util.Random.shuffle((1 to n).toList)
      .map(i => (i.toLong, s"v$i"))
    val df = data.toDF("k", "v").repartition(7)
    val ranked = Rank.rankGlobal(df, Seq(col("k")), "r")
      .select(col("k"), col("r")).as[(Long, Long)].collect().toMap
    (1 to n).foreach(i => assert(ranked(i.toLong) == i.toLong,
      s"rank of $i should be $i, got ${ranked(i.toLong)}"))
  }

  test("ntileOfRank reproduces NTILE fat-bucket-first sizing") {
    // n = 13, b = 5: NTILE gives sizes 3,3,3,2,2.
    val df = (1L to 13L).toDF("r")
      .withColumn("t", Rank.ntileOfRank(col("r"), 13L, 5))
    val sizes = df.groupBy("t").count().as[(Int, Long)].collect().toMap
    assert(sizes == Map(1 -> 3L, 2 -> 3L, 3 -> 3L, 4 -> 2L, 5 -> 2L), sizes.toString)
    // bucket assignment is monotone in rank
    val byRank = df.orderBy("r").select("t").as[Int].collect()
    assert(byRank.sameElements(byRank.sorted), byRank.mkString(","))
  }

  test("ntileExact plans no SinglePartition exchange") {
    val df = (1 to 100).map(i => (i.toLong, i % 7)).toDF("k", "grp")
    val tiled = Rank.ntileExact(df, Seq(col("grp"), col("k")), 4, "t")
    val p = tiled.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"),
      s"exact ntile must stay distributed:\n$p")
    // and it still matches the window NTILE answer
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("grp"), col("k"))
    val expected = df.withColumn("t", ntile(4).over(w))
      .select(col("k"), col("t")).as[(Long, Int)].collect().toMap
    val got = tiled.select(col("k"), col("t")).as[(Long, Int)].collect().toMap
    assert(got == expected)
  }

  test("attribution conserves purchase revenue across both models") {
    val df = graft.SparkEntry.queries("q_attribution")(spark, Sf)
      .groupBy(col("model")).agg(
        sum(col("n_purchases")).as("n"), sum(col("revenue_cents")).as("rev"))
      .as[(String, Long, Long)].collect()
      .map { case (k, n, r) => k -> ((n, r)) }.toMap
    val total = graft.queries.Tables.load(spark, Sf, "events")
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)), sum(round(col("value") * 100).cast("long")))
      .as[(Long, Long)].head()
    assert(df("first") == total && df("last") == total,
      s"each model must account for every purchase exactly once: $df vs $total")
  }

  test("rank-sum AUC identity (eval_auc's pipeline) equals brute-force pair counting") {
    // heavy-tie score set: 2·U from the midrank identity over rankGlobal
    // must equal the direct count of 2·[s⁺>s⁻] + [s⁺=s⁻] over all pairs
    val rng = new scala.util.Random(7)
    val rows = (1L to 300L).map(i => (i, (rng.nextInt(9) - 4).toLong,
      if (rng.nextBoolean()) 1L else 0L))
    val df = rows.toDF("doc_id", "score", "label").repartition(5)
    val ranked = Rank.rankGlobal(df, Seq(col("score"), col("doc_id")), "r")
    val (nPos, nNeg, rp2) = ranked.groupBy(col("score"))
      .agg(min(col("r")).as("minr"), count(lit(1)).as("cnt"),
        sum(col("label")).as("posc"))
      .agg(sum(col("posc")), sum(col("cnt") - col("posc")),
        sum(col("posc") * (col("minr") * 2 + col("cnt") - 1)))
      .as[(Long, Long, Long)].head()
    val u2 = rp2 - nPos * (nPos + 1)
    val pos = rows.filter(_._3 == 1L).map(_._2)
    val neg = rows.filter(_._3 == 0L).map(_._2)
    val brute = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(nPos == pos.size && nNeg == neg.size)
    assert(u2 == brute, s"2U midrank=$u2 brute=$brute")
  }

  test("runningMaxExclusive matches the sequential exclusive max, any partitioning") {
    import spark.implicits._
    val vals = Seq(5L, 3L, 9L, 1L, 9L, 2L, 7L, 10L, 4L, 6L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    for (parts <- Seq(1, 3, 7)) {
      val df = vals.toDF("id", "v").repartition(parts)
      val got = Rank.runningMaxExclusive(df, Seq(col("id")), "v", "rm")
        .orderBy(col("id")).select("id", "rm").as[(Long, Option[Long])]
        .collect().toSeq
      val expect = vals.indices.map(i =>
        (i.toLong, if (i == 0) None else Some(vals.take(i).map(_._2).max)))
      assert(got == expect, s"parts=$parts: $got vs $expect")
    }
  }

  test("runningSumsInclusive matches the sequential CDF pair, any partitioning") {
    import spark.implicits._
    val vals = Seq((1L, 2L, 0L), (2L, 0L, 3L), (3L, 1L, 1L), (4L, 5L, 0L),
      (5L, 0L, 0L), (6L, 2L, 7L))
    for (parts <- Seq(1, 3, 5)) {
      val df = vals.toDF("v", "a", "b").repartition(parts)
      val got = Rank.runningSumsInclusive(df, Seq(col("v")), Seq("a", "b"))
        .orderBy(col("v")).select("v", "a_cum", "b_cum")
        .as[(Long, Long, Long)].collect().toSeq
      val expect = vals.indices.map { i =>
        val pre = vals.take(i + 1)
        (vals(i)._1, pre.map(_._2).sum, pre.map(_._3).sum)
      }
      assert(got == expect, s"parts=$parts: $got vs $expect")
    }
  }

  test("runningSumsInclusive: null values add zero, never poison the prefix") {
    import spark.implicits._
    val df = Seq((1L, Some(2L)), (2L, None), (3L, Some(5L)), (4L, None))
      .toDF("v", "a").repartition(3)
    val got = Rank.runningSumsInclusive(df, Seq(col("v")), Seq("a"))
      .orderBy(col("v")).select("v", "a_cum").as[(Long, Long)]
      .collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (3L, 7L), (4L, 7L)), got.toString)
  }
}
