package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based coverage for the pure codecs and for operator
  * equivalences against naive reference implementations (the reference
  * repo has no property tests at all — SURVEY §5 upgrades the oracle).
  * Raw ScalaCheck generators with deterministic seeds (the
  * scalatest-scalacheck bridge is not on the offline classpath).
  */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int, seed: Long = 42L): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(seed + i)))

  private val idSeg: Gen[String] = for {
    n <- Gen.choose(1, 12)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString

  test("property: YAML path codec round-trips any id tuple at any depth") {
    val gen = Gen.choose(1, 5).flatMap(k => Gen.listOfN(k, idSeg))
    samples(gen, 50).foreach { ids =>
      val path = graft.drivers.YamlPathCodec.pathFromIds(ids)
      assert(graft.drivers.YamlPathCodec.idsFromPath(s"/base/$path", ids.size) == ids,
        s"ids=$ids path=$path")
    }
  }

  test("property: as-of join equals the naive quadratic definition (both directions)") {
    import graft.ops.Joins
    import spark.implicits._
    val gen = for {
      nl <- Gen.choose(1, 30)
      nr <- Gen.choose(0, 30)
      lefts <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L)))
      rights0 <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L)))
      // duplicate (key, time) right rows make the window tie-break
      // nondeterministic by design — keep distinct sort keys
    } yield (lefts, rights0.distinct)
    samples(gen, 8).foreach { case (lefts, rights) =>
      val l = lefts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val r = rights.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("rid", "k", "rt")
      def naive(forward: Boolean): Map[Long, Option[Long]] =
        lefts.zipWithIndex.map { case ((k, t), i) =>
          val cand = rights.zipWithIndex
            .filter { case ((rk, rt), _) => rk == k && (if (forward) rt >= t else rt <= t) }
          val best =
            if (cand.isEmpty) None
            else {
              val extremeT =
                if (forward) cand.map(_._1._2).min else cand.map(_._1._2).max
              cand.find(_._1._2 == extremeT).map(_._2.toLong)
            }
          i.toLong -> best
        }.toMap
      for (forward <- Seq(false, true)) {
        val dir = if (forward) Joins.AsofForward else Joins.AsofBackward
        val got = Joins.asof(l, r, "k", "t", "rt", Map("rid" -> "matched"), dir)
          .select("lid", "matched").collect()
          .map(row => row.getLong(0) -> Option(row.get(1)).map(_.asInstanceOf[Long]))
          .toMap
        assert(got == naive(forward), s"forward=$forward lefts=$lefts rights=$rights")
      }
    }
  }

  test("property: binned range join equals the naive quadratic join on random intervals") {
    import graft.ops.Joins
    import spark.implicits._
    val gen = for {
      np <- Gen.choose(1, 40)
      ni <- Gen.choose(1, 15)
      points <- Gen.listOfN(np, Gen.choose(0L, 200L))
      ivs <- Gen.listOfN(ni, Gen.zip(Gen.choose(0L, 200L), Gen.choose(0L, 80L)))
      bin <- Gen.oneOf(1L, 7L, 64L, 128L)
    } yield (points, ivs.map { case (lo, w) => (lo, lo + w) }, bin)
    samples(gen, 8).foreach { case (points, ivs, bin) =>
      val p = points.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("pid", "t")
      val iv = ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("iid", "lo", "hi")
      val binned = Joins.rangeJoin(p, "t", iv, "lo", "hi", binSize = bin)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive = (for {
        (t, pi) <- points.zipWithIndex
        ((lo, hi), ii) <- ivs.zipWithIndex
        if t >= lo && t < hi
      } yield (pi.toLong, ii.toLong)).toSet
      assert(binned == naive,
        s"bin=$bin missing=${naive -- binned} extra=${binned -- naive}")
    }
  }

  test("property: deterministic sampling is monotone in rate and bounded") {
    import graft.ops.TextOps
    import spark.implicits._
    val ids = (1L to 5000L).toDF("id")
    def pick(rate: Double) = ids.filter(TextOps.deterministicSample(col("id"), rate, "p"))
      .collect().map(_.getLong(0)).toSet
    val r0 = pick(0.0); val r1 = pick(0.1); val r3 = pick(0.3); val all = pick(1.0)
    assert(r0.isEmpty)
    assert(r1.subsetOf(r3), "lower rate must select a subset of higher rate")
    assert(r3.subsetOf(all))
    assert(all.size >= 4999, "rate 1.0 keeps (essentially) everything")
  }

  test("property: repetition ratio bounded in [0,1); 0 for distinct shingles, high for loops") {
    import graft.ops.TextOps
    import spark.implicits._
    val t = Seq(
      (1L, (1 to 30).map(i => s"w$i").mkString(" ")), // all distinct
      (2L, Seq.fill(30)("la").mkString(" ")),          // maximal repetition
      (3L, "a b")                                       // sub-k
    ).toDF("id", "text")
    val rr = t.select(col("id"), TextOps.repetitionRatio(col("text"), 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rr(1L) == 0.0)
    assert(rr(2L) > 0.9 && rr(2L) < 1.0)
    assert(rr(3L) == 0.0)
  }

  test("property: single-stratum stratified sampling equals deterministic sampling") {
    import graft.ops.TextOps
    import spark.implicits._
    // a mixing recipe with one uniform rate must select EXACTLY the rows
    // the flat sampler selects (same hash, same threshold quantization)
    val rows = (1L to 3000L).map(i => (i, s"s${i % 3}")).toDF("id", "stratum")
    Seq(0.05, 0.3, 0.77).foreach { rate =>
      val flat = rows.filter(TextOps.deterministicSample(col("id"), rate, "eq"))
        .select("id").collect().map(_.getLong(0)).toSet
      val strat = rows.filter(TextOps.stratifiedSample(col("id"), col("stratum"),
          rates = Map("s0" -> rate, "s1" -> rate, "s2" -> rate), salt = "eq"))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(strat == flat, s"rate=$rate diff=${(strat diff flat) ++ (flat diff strat)}")
    }
  }

  test("property: native repetition ratio equals brute-force string-window distinctness") {
    import graft.ops.TextOps
    import spark.implicits._
    // small vocab maximizes window collisions; empty tokens simulate the
    // double-space edge the byte scanner must honor like split(' ')
    val tok: Gen[String] = Gen.frequency(
      6 -> Gen.oneOf("a", "b", "c", "dog", "cat"), 1 -> Gen.const(""))
    (1 to 5).foreach { k =>
      val gen = Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, tok)).map(_.mkString(" "))
      val texts = samples(gen, 30, seed = 1000L + k).zipWithIndex.map(_.swap)
      val got = texts.toDF("id", "text")
        .select(col("id"), TextOps.repetitionRatio(col("text"), k).as("r"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      texts.foreach { case (id, text) =>
        val toks = text.split(" ", -1).toSeq // -1: keep trailing empties, like Spark split
        val expected =
          if (toks.size < k) 0.0
          else {
            val wins = toks.sliding(k).toSeq
            BigDecimal(1.0 - wins.distinct.size.toDouble / wins.size)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          }
        assert(got(id) == expected,
          s"k=$k id=$id text='$text' got=${got(id)} expected=$expected")
      }
    }
  }

  test("property: semiring path fixpoints equal driver-side relaxation on random DAGs") {
    import graft.ops.Graphs
    import spark.implicits._
    // random DAG sinking toward 0: every node i ≥ 1 gets 1–2 edges to
    // strictly smaller targets, so both semirings converge; reference =
    // naive driver-side relaxation to fixpoint
    val gen = for {
      n <- Gen.choose(3, 12)
      edges <- Gen.sequence[Seq[(Long, Long, Long)], (Long, Long, Long)](
        (1 to n).flatMap { i =>
          Seq(for {
            t <- Gen.choose(0, i - 1)
            w <- Gen.choose(0L, 9L)
          } yield (i.toLong, t.toLong, w))
        })
    } yield edges
    def ref(edges: Seq[(Long, Long, Long)], init: Long,
        combine: (Long, Long) => Long, better: (Long, Long) => Boolean): Map[Long, Long] = {
      var d = Map(0L -> init)
      var changed = true
      while (changed) {
        changed = false
        for ((s, t, w) <- edges; dt <- d.get(t)) {
          val c = combine(w, dt)
          if (d.get(s).forall(cur => better(c, cur))) { d += (s -> c); changed = true }
        }
      }
      d
    }
    val sink = spark.createDataFrame(Seq(Tuple1(0L))).toDF("node")
    samples(gen, 4, seed = 99L).foreach { edges =>
      val df = edges.toDF("src", "dst", "w")
      val cheap = Graphs.cheapestPaths(df, sink)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cheap == ref(edges, 0L, _ + _, _ < _), s"min/+ on $edges")
      val wide = Graphs.widestPaths(df, sink)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(wide == ref(edges, Long.MaxValue, math.min, _ > _),
        s"max/min on $edges")
    }
  }

  test("property: exact dedup keeps exactly one survivor per fingerprint group") {
    import graft.ops.Dedup
    import spark.implicits._
    val docGen = Gen.listOfN(40, Gen.zip(Gen.choose(0, 8), Gen.alphaLowerStr))
    samples(docGen, 5).foreach { docs =>
      // duplicate texts drawn from a small pool force real collisions
      val df = docs.zipWithIndex
        .map { case ((pool, salt), i) => (i.toLong, s"doc pool $pool ${salt.take(2)}") }
        .toDF("doc_id", "text")
      val out = Dedup.exact(df, "text", "doc_id").collect()
      val byFp = out.groupBy(_.getString(1))
      assert(byFp.values.forall(_.length == 1), "one survivor per fingerprint")
      assert(out.map(_.getLong(2)).sum == docs.size, "group sizes partition the corpus")
    }
  }

  test("property: BPE encode reconstructs the word and never exceeds its length") {
    import graft.ops.Subword
    val wordGen = for {
      n <- Gen.choose(1, 24)
      cs <- Gen.listOfN(n, Gen.alphaLowerChar)
    } yield cs.mkString
    samples(wordGen, 200).foreach { w =>
      val pieces = Subword.encodeBpe(w, Subword.DefaultMerges)
      assert(pieces.mkString == w, s"round-trip failed for $w")
      assert(pieces.nonEmpty && pieces.size <= w.length)
      // merges only ever concatenate adjacent pieces: every piece is a
      // contiguous substring of the word at its own offset
      val offsets = pieces.scanLeft(0)(_ + _.length)
      pieces.zip(offsets).foreach { case (p, off) =>
        assert(w.substring(off, off + p.length) == p)
      }
    }
  }

  test("property: hex shard is stable, in [0,16), and salt-sensitive") {
    import graft.ops.TextOps
    import spark.implicits._
    val ids = samples(Gen.choose(0L, 1000000L), 300).distinct
    val df = ids.toDF("id")
    val s1 = df.select(col("id"), TextOps.hexShard(col("id"), "a").as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val s2 = df.repartition(7)
      .select(col("id"), TextOps.hexShard(col("id"), "a").as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(s1 == s2, "placement is partitioning-independent")
    assert(s1.values.forall(s => s >= 0 && s < 16))
    assert(s1.values.toSet.size > 8, "spread over most shards")
    val salted = df.select(col("id"), TextOps.hexShard(col("id"), "b").as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(salted != s1, "salt changes the draw")
  }

  test("property: URL canonicalization is idempotent and structure-preserving") {
    import graft.ops.TextOps
    import spark.implicits._
    val gen: Gen[String] = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS", "ftp")
      host <- Gen.oneOf("Example.COM", "example.com", "CDN.Example.com", "h")
      port <- Gen.oneOf("", ":80", ":443", ":8080", ":65000")
      segs <- Gen.choose(0, 3).flatMap(Gen.listOfN(_, idSeg))
      trail <- Gen.oneOf("", "/")
      params <- Gen.choose(0, 4).flatMap(Gen.listOfN(_, Gen.oneOf(
        "utm_source=a", "utm_campaign=b", "gclid=1", "fbclid=2", "ref=r",
        "id=7", "page=2", "q=x", "flag")))
      frag <- Gen.oneOf("", "#sec", "#a/b?c")
    } yield {
      val path = segs.map("/" + _).mkString
      val q = if (params.isEmpty) "" else "?" + params.mkString("&")
      s"$scheme://$host$port$path$trail$q$frag"
    }
    val urls = samples(gen, 120).distinct
    val df = urls.toDF("url")
      .select(col("url"), TextOps.canonicalizeUrl(col("url")).as("c1"))
      .select(col("url"), col("c1"), TextOps.canonicalizeUrl(col("c1")).as("c2"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    for ((u, c1, c2) <- df) {
      assert(c1 == c2, s"idempotence: canon($u)=$c1 but canon(canon)=$c2")
      assert(!c1.contains("#"), s"fragment must not survive: $u -> $c1")
      assert(!c1.matches(".*[?&](utm_[^=]*|gclid|fbclid|msclkid|ref)=.*"),
        s"tracking param survived: $u -> $c1")
      val scheme = c1.takeWhile(_ != ':')
      assert(scheme == scheme.toLowerCase, s"scheme case: $c1")
      // the generated corpus is all absolute URLs: canon keeps scheme://
      assert(c1.contains("://"), s"absolute form lost: $u -> $c1")
    }
  }

  test("property: rankGlobal is a sort-consistent permutation under ties and nulls") {
    import graft.ops.Rank
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 200)
      ks <- Gen.listOfN(n, Gen.choose(0L, 20L)) // heavy ties by design
    } yield ks
    samples(gen, 6).foreach { ks =>
      val df = ks.zipWithIndex.map { case (k, i) => (k, i.toLong) }
        .toDF("k", "uid").repartition(7)
      // total order via the uid tiebreak (the documented contract)
      val got = Rank.rankGlobal(df, Seq(col("k"), col("uid")), "r")
        .select(col("k"), col("uid"), col("r"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.map(_._3).sorted.sameElements(1L to ks.size.toLong),
        "ranks must be a permutation of 1..n")
      val bySort = got.sortBy(t => (t._1, t._2)).map(_._3)
      assert(bySort.sameElements(1L to ks.size.toLong),
        "rank order must equal the sort order")
    }
  }

  test("property: dp noise is word-width bounded and key-deterministic") {
    import graft.ops.Curation
    import spark.implicits._
    val keys = samples(idSeg, 300).distinct
    val once = keys.toDF("k")
      .select(col("k"), Curation.dpGeometricNoise(col("k"), "dp").as("z"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val again = keys.toDF("k").repartition(5)
      .select(col("k"), Curation.dpGeometricNoise(col("k"), "dp").as("z"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(once == again, "noise must be a pure function of the key")
    assert(once.values.forall(z => z > -32 && z < 32), "two-sided geometric bound")
  }
}
