package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Geospatial capability surface: grid-cell bucketed spatial joins —
  * the planar analog of geohash/S2 indexing every large-scale spatial
  * pipeline uses. The reference delegates geometry to its backing
  * store; here the join itself is the operator under test.
  *
  * Coordinates are SYNTHETIC but deterministic: integer 10⁻⁴-degree
  * units derived from md5 words (the dpGeometricNoise recipe,
  * `ops/Curation.scala:209`), shifted non-negative so truncating
  * division agrees across engines. The corpus has no native lat/lon;
  * md5 derivation makes the geometry oracle-replayable bit-exact.
  *
  * Candidate generation is LOSSLESS by construction: with cell size
  * C = R, two points within L2 distance R differ by ≤ 1 in each cell
  * coordinate, so probing the 3×3 neighbor ring finds every true
  * match — the DuckDB oracle verifies against an INDEPENDENT plain
  * theta-join (O(n·m) is fine at oracle scale), so a lossy ring would
  * fail the gate rather than hide.
  *
  * 100 TB shape: both sides shuffle ONCE on (cx, cy); per-cell work is
  * occupancy-bounded (9 cells per probe), never all-pairs. Grid
  * resolution R is the knob trading ring width for cell occupancy;
  * pathological cell skew is AQE skew-join territory (the
  * q_skew_aqe_join precedent).
  */
object GeoQueries {
  import Tables._

  /** 10° search radius in 10⁻⁴-degree units; also the grid cell size
    * (C = R is what makes the 3×3 ring lossless). Sized so the gate
    * BITES at sf0.001 (≈ a dozen true pairs among 150 customers on
    * the 120°×360° domain — a tighter radius returns zero rows and
    * verifies nothing). */
  private val R = 100000L

  /** Domain extent in cells: lat ∈ [0,120°) → 12 cells, lon ∈ [0,360°)
    * → 36. Ring generation clamps to these bounds so no dead
    * (never-matching, out-of-domain) candidate rows enter the shuffle —
    * ~1/12 of unclamped ring volume at this R. */
  private val LatCells = 1200000L / R
  private val LonCells = 3600000L / R

  /** 32-bit md5 word of (key ‖ salt) — uniform, oracle-replayable. */
  private def word(c: Column, salt: String): Column =
    conv(substring(md5(concat(c.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long")

  /** Customer points on the [0,120°)×[0,360°) integer grid. */
  private def custPts(spark: SparkSession, sf: String): DataFrame =
    load(spark, sf, "customer").select(col("c_custkey"),
      (word(col("c_custkey"), "clat") % 1200000L).as("lat"),
      (word(col("c_custkey"), "clon") % 3600000L).as("lon"))

  private def suppPts(spark: SparkSession, sf: String): DataFrame =
    load(spark, sf, "supplier").select(col("s_suppkey"),
      (word(col("s_suppkey"), "slat") % 1200000L).as("slat"),
      (word(col("s_suppkey"), "slon") % 3600000L).as("slon"))

  /** (supplier, customer, d²) candidate pairs within R: suppliers
    * explode into their 3×3 cell ring, ONE keyed join on (cx, cy),
    * exact integer L2 filter — no cartesian anywhere. */
  private def pairsWithinR(spark: SparkSession, sf: String): DataFrame = {
    val cust = custPts(spark, sf)
      .withColumn("cx", expr(s"lat div $R"))
      .withColumn("cy", expr(s"lon div $R"))
    val ring = suppPts(spark, sf)
      .select(col("s_suppkey"), col("slat"), col("slon"),
        explode(expr(s"sequence(greatest(0L, slat div $R - 1), " +
          s"least(${LatCells - 1}L, slat div $R + 1))")).as("cx"))
      .select(col("s_suppkey"), col("slat"), col("slon"), col("cx"),
        explode(expr(s"sequence(greatest(0L, slon div $R - 1), " +
          s"least(${LonCells - 1}L, slon div $R + 1))")).as("cy"))
    ring.join(cust, Seq("cx", "cy"))
      .withColumn("d2",
        (col("slat") - col("lat")) * (col("slat") - col("lat")) +
          (col("slon") - col("lon")) * (col("slon") - col("lon")))
      .filter(col("d2") <= lit(R * R))
  }

  /** True (ring-widening) kNN: probe the Chebyshev ring of width `w`,
    * confirm suppliers whose k-th candidate sits within w·R — on the
    * integer grid any point OUTSIDE ring w is STRICTLY farther than w·R,
    * so those top-k are final — and double w for the unconfirmed rest.
    * Terminates in ≤ ⌈log₂ 36⌉ + 1 = 7 rounds (w = 1,2,4,…,36; the last
    * ring spans the whole domain, where "ranked top-k" is uncondition-
    * ally final even for probes with < k reachable customers). The
    * bounded driver loop holds only O(1) per-round bookkeeping; every
    * round is one keyed (cx,cy) join + one per-supplier window over the
    * (shrinking) unconfirmed probe set — the empty-neighborhood case
    * that silently returned < k under the radius-bounded variant
    * (q_geo_knn) now widens until k found.
    */
  private def knnFull(spark: SparkSession, sf: String, k: Int): DataFrame = {
    val cust = custPts(spark, sf)
      .withColumn("cx", expr(s"lat div $R"))
      .withColumn("cy", expr(s"lon div $R"))
    val maxW = math.max(LatCells, LonCells).toInt
    var remaining = suppPts(spark, sf)
    var out: Option[DataFrame] = None
    var w = 1
    var done = false
    while (!done) {
      val pairs = remaining
        .select(col("s_suppkey"), col("slat"), col("slon"),
          explode(expr(s"sequence(greatest(0L, slat div $R - $w), " +
            s"least(${LatCells - 1}L, slat div $R + $w))")).as("cx"))
        .select(col("s_suppkey"), col("slat"), col("slon"), col("cx"),
          explode(expr(s"sequence(greatest(0L, slon div $R - $w), " +
            s"least(${LonCells - 1}L, slon div $R + $w))")).as("cy"))
        .join(cust, Seq("cx", "cy"))
        .withColumn("d2",
          (col("slat") - col("lat")) * (col("slat") - col("lat")) +
            (col("slon") - col("lon")) * (col("slon") - col("lon")))
      val ranked = pairs.withColumn("rnk", row_number().over(
          Window.partitionBy(col("s_suppkey"))
            .orderBy(col("d2"), col("c_custkey"))))
        .filter(col("rnk") <= k)
      val wr2 = w.toLong * w.toLong * R * R
      val confirmedKeys =
        if (w >= maxW) remaining.select(col("s_suppkey"))
        else ranked.groupBy(col("s_suppkey"))
          .agg(sum(when(col("d2") <= wr2, 1L).otherwise(0L)).as("sure"))
          .filter(col("sure") >= k).select(col("s_suppkey"))
      val finished = ranked
        .join(confirmedKeys, Seq("s_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("rnk"), col("c_custkey"), col("d2"))
        .persist()
      finished.count(): Unit
      out = Some(out.fold(finished)(_.unionByName(finished)))
      if (w >= maxW) done = true
      else {
        val next = remaining
          .join(confirmedKeys, Seq("s_suppkey"), "left_anti").persist()
        if (next.isEmpty) done = true
        remaining = next
        w = math.min(w * 2, maxW)
      }
    }
    out.get.orderBy(col("s_suppkey"), col("rnk"))
  }

  /** Fixed-count hot cluster for the skewed-grid gate: the first
    * `HotCust` customers / `HotSupp` suppliers collapse into grid cell
    * (5,5) (spread uniformly WITHIN the cell so rows stay
    * incompressible — AQE's skew detection keys on partition BYTES).
    * Absolute counts, not fractions: the hot cell's candidate mass is
    * constant as the corpus scales, so the gate stays sublinear in
    * growthcheck while the cell stays ~30-60× the median occupancy at
    * the tested SFs — exactly the "popular city" shape of real geo
    * workloads.
    */
  private val HotCust = 1000L
  private val HotSupp = 100L

  private def skewCustPts(spark: SparkSession, sf: String): DataFrame =
    load(spark, sf, "customer").select(col("c_custkey"),
      when(col("c_custkey") <= HotCust,
          lit(5L * R) + word(col("c_custkey"), "hlat") % R)
        .otherwise(word(col("c_custkey"), "clat") % 1200000L).as("lat"),
      when(col("c_custkey") <= HotCust,
          lit(5L * R) + word(col("c_custkey"), "hlon") % R)
        .otherwise(word(col("c_custkey"), "clon") % 3600000L).as("lon"),
      md5(col("c_custkey").cast("string")).as("pad"))

  private def skewSuppPts(spark: SparkSession, sf: String): DataFrame =
    load(spark, sf, "supplier").select(col("s_suppkey"),
      when(col("s_suppkey") <= HotSupp,
          lit(5L * R) + word(col("s_suppkey"), "hslat") % R)
        .otherwise(word(col("s_suppkey"), "slat") % 1200000L).as("slat"),
      when(col("s_suppkey") <= HotSupp,
          lit(5L * R) + word(col("s_suppkey"), "hslon") % R)
        .otherwise(word(col("s_suppkey"), "slon") % 3600000L).as("slon"))

  /** The skewed radius join — shared by the gate and PlanAudit's
    * structural isSkewJoin assertion. repartition(16) on the customer
    * side for the same reason q_skew_aqe_join carries it: AQE skew
    * splits are map-index ranges, and the tiny single-file test scan
    * must present >1 upstream map task the way any real multi-split
    * input does.
    */
  private[queries] def skewedPairsRollup(spark: SparkSession, sf: String): DataFrame = {
    val cust = skewCustPts(spark, sf).repartition(16)
      .withColumn("cx", expr(s"lat div $R"))
      .withColumn("cy", expr(s"lon div $R"))
    val ring = skewSuppPts(spark, sf)
      .select(col("s_suppkey"), col("slat"), col("slon"),
        explode(expr(s"sequence(greatest(0L, slat div $R - 1), " +
          s"least(${LatCells - 1}L, slat div $R + 1))")).as("cx"))
      .select(col("s_suppkey"), col("slat"), col("slon"), col("cx"),
        explode(expr(s"sequence(greatest(0L, slon div $R - 1), " +
          s"least(${LonCells - 1}L, slon div $R + 1))")).as("cy"))
    ring.join(cust, Seq("cx", "cy"))
      .withColumn("d2",
        (col("slat") - col("lat")) * (col("slat") - col("lat")) +
          (col("slon") - col("lon")) * (col("slon") - col("lon")))
      .filter(col("d2") <= lit(R * R))
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("n_within"), min(col("d2")).as("min_d2"),
        max(col("pad")).as("max_pad"))
      .orderBy(col("s_suppkey"))
  }

  /** Shared oracle CTEs: points + the INDEPENDENT theta-join pairs. */
  private val OraclePts: String =
    s"""WITH c AS (
       |  SELECT c_custkey,
       |    ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'clat'), 1, 8))::BIGINT
       |      % 1200000 AS lat,
       |    ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'clon'), 1, 8))::BIGINT
       |      % 3600000 AS lon
       |  FROM customer),
       |sp AS (
       |  SELECT s_suppkey,
       |    ('0x' || substr(md5(CAST(s_suppkey AS VARCHAR) || 'slat'), 1, 8))::BIGINT
       |      % 1200000 AS slat,
       |    ('0x' || substr(md5(CAST(s_suppkey AS VARCHAR) || 'slon'), 1, 8))::BIGINT
       |      % 3600000 AS slon
       |  FROM supplier)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // Radius join: for every supplier, how many customers sit within
    // R, and how close is the nearest — the "stores near me" /
    // coverage-analysis primitive. LEFT join keeps zero-match
    // suppliers (n_within = 0, min_d2 NULL on both engines).
    QueryDef("q_geo_cell_join",
      (spark, sf) => {
        val agg = pairsWithinR(spark, sf)
          .groupBy(col("s_suppkey"))
          .agg(count(lit(1)).as("m"), min(col("d2")).as("md"))
        suppPts(spark, sf).select(col("s_suppkey"))
          .join(agg, Seq("s_suppkey"), "left")
          .select(col("s_suppkey"),
            coalesce(col("m"), lit(0L)).as("n_within"),
            col("md").as("min_d2"))
          .orderBy(col("s_suppkey"))
      },
      Some(s"""$OraclePts
             |SELECT sp.s_suppkey,
             |  CAST(COUNT(c.c_custkey) AS BIGINT) AS n_within,
             |  CAST(MIN((sp.slat - c.lat) * (sp.slat - c.lat)
             |    + (sp.slon - c.lon) * (sp.slon - c.lon)) AS BIGINT) AS min_d2
             |FROM sp LEFT JOIN c
             |  ON (sp.slat - c.lat) * (sp.slat - c.lat)
             |     + (sp.slon - c.lon) * (sp.slon - c.lon) <= ${R * R}
             |GROUP BY sp.s_suppkey ORDER BY sp.s_suppkey""".stripMargin)),

    // Radius-bounded k-nearest-neighbors (k = 5): the grid-kNN first
    // pass every spatial serving stack runs (a full kNN would widen
    // the ring until k found; the bounded variant is the disclosed
    // semantics here and the common case — beyond-R neighbors are
    // "no result"). Per-probe ranking is a KEYED window (partitioned
    // by supplier — never a global sort); ties break on c_custkey.
    QueryDef("q_geo_knn",
      (spark, sf) => pairsWithinR(spark, sf)
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("s_suppkey"))
            .orderBy(col("d2"), col("c_custkey"))))
        .filter(col("rnk") <= 5)
        .select(col("s_suppkey"), col("rnk"), col("c_custkey"), col("d2"))
        .orderBy(col("s_suppkey"), col("rnk")),
      Some(s"""$OraclePts,
             |p AS (
             |  SELECT sp.s_suppkey, c.c_custkey,
             |    (sp.slat - c.lat) * (sp.slat - c.lat)
             |      + (sp.slon - c.lon) * (sp.slon - c.lon) AS d2
             |  FROM sp JOIN c
             |    ON (sp.slat - c.lat) * (sp.slat - c.lat)
             |       + (sp.slon - c.lon) * (sp.slon - c.lon) <= ${R * R})
             |SELECT s_suppkey, CAST(rnk AS INT) AS rnk, c_custkey, d2 FROM (
             |  SELECT s_suppkey, c_custkey, d2,
             |    ROW_NUMBER() OVER (PARTITION BY s_suppkey
             |                       ORDER BY d2, c_custkey) AS rnk
             |  FROM p)
             |WHERE rnk <= 5 ORDER BY s_suppkey, rnk""".stripMargin)),

    // TRUE kNN (ring-widening): unlike the radius-bounded q_geo_knn, a
    // probe in an empty neighborhood widens its ring (w doubling,
    // ≤ 7 bounded rounds) until k are CONFIRMED — a candidate set is
    // final once the k-th sits within w·R, since everything outside
    // ring w is strictly farther on the integer grid. The oracle is the
    // INDEPENDENT full theta-join kNN (no grid, no radius), so any
    // confirmation-logic error fails the hash rather than hiding.
    QueryDef("q_geo_knn_full",
      (spark, sf) => knnFull(spark, sf, k = 5),
      Some(s"""$OraclePts,
             |p AS (
             |  SELECT sp.s_suppkey, c.c_custkey,
             |    (sp.slat - c.lat) * (sp.slat - c.lat)
             |      + (sp.slon - c.lon) * (sp.slon - c.lon) AS d2
             |  FROM sp CROSS JOIN c)
             |SELECT s_suppkey, CAST(rnk AS INT) AS rnk, c_custkey, d2 FROM (
             |  SELECT s_suppkey, c_custkey, d2,
             |    ROW_NUMBER() OVER (PARTITION BY s_suppkey
             |                       ORDER BY d2, c_custkey) AS rnk
             |  FROM p)
             |WHERE rnk <= 5 ORDER BY s_suppkey, rnk""".stripMargin)),

    // Skewed grid — the "popular city" shape: a fixed-size hot cluster
    // (1000 customers + 100 suppliers in ONE cell) makes the (cx,cy)
    // shuffle partition 30-60× the median at the tested SFs. The gate
    // hashes the radius rollup against an independent theta-join on the
    // SAME skewed points; the PLAN property — AQE's OptimizeSkewedJoin
    // actually splitting the hot partition — is asserted structurally
    // in PlanAudit (the etl_skewed_upsert pattern). The md5 pad rides
    // through max() so hot-partition shuffle bytes track row counts
    // (constant-key partitions otherwise compress away the size signal
    // skew detection keys on). Absolute hot counts keep the gate
    // sublinear in growthcheck: candidate mass in the hot cell is
    // constant as the corpus scales.
    QueryDef("q_geo_skew_join",
      (spark, sf) => skewedPairsRollup(spark, sf),
      Some {
        def pt(key: String, hotN: Long, hs: String, cs: String,
            hotBase: Long, m: Long): String =
          s"""CASE WHEN $key <= $hotN THEN $hotBase +
             |    ('0x' || substr(md5(CAST($key AS VARCHAR) || '$hs'), 1, 8))::BIGINT % $R
             |  ELSE ('0x' || substr(md5(CAST($key AS VARCHAR) || '$cs'), 1, 8))::BIGINT % $m
             |  END""".stripMargin.replace("\n", " ")
        s"""WITH c AS (
           |  SELECT c_custkey,
           |    ${pt("c_custkey", HotCust, "hlat", "clat", 5L * R, 1200000L)} AS lat,
           |    ${pt("c_custkey", HotCust, "hlon", "clon", 5L * R, 3600000L)} AS lon,
           |    md5(CAST(c_custkey AS VARCHAR)) AS pad
           |  FROM customer),
           |sp AS (
           |  SELECT s_suppkey,
           |    ${pt("s_suppkey", HotSupp, "hslat", "slat", 5L * R, 1200000L)} AS slat,
           |    ${pt("s_suppkey", HotSupp, "hslon", "slon", 5L * R, 3600000L)} AS slon
           |  FROM supplier)
           |SELECT sp.s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_within,
           |  CAST(MIN((sp.slat - c.lat) * (sp.slat - c.lat)
           |    + (sp.slon - c.lon) * (sp.slon - c.lon)) AS BIGINT) AS min_d2,
           |  MAX(c.pad) AS max_pad
           |FROM sp JOIN c
           |  ON (sp.slat - c.lat) * (sp.slat - c.lat)
           |     + (sp.slon - c.lon) * (sp.slon - c.lon) <= ${R * R}
           |GROUP BY sp.s_suppkey ORDER BY sp.s_suppkey""".stripMargin
      }),

    // Cell-density heatmap: top-20 densest grid cells — the
    // aggregation face of the same grid (geohash rollup). ONE keyed
    // shuffle on (cx, cy); ties break on the cell coordinates.
    QueryDef("q_geo_density",
      (spark, sf) => custPts(spark, sf)
        .select(expr(s"lat div $R").as("cx"), expr(s"lon div $R").as("cy"))
        .groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("cx"), col("cy"))
        .limit(20),
      Some(s"""$OraclePts
             |SELECT lat // $R AS cx, lon // $R AS cy,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |FROM c GROUP BY 1, 2
             |ORDER BY n DESC, cx, cy LIMIT 20""".stripMargin)),

    // Grid-density clustering (GDBSCAN/STING family): dense cells
    // (occupancy ≥ θ = max(2, m + 2⌊√m⌋) with m the mean cell
    // occupancy — the Poisson two-sigma cut, adaptive so STRUCTURE
    // survives as the fixed domain densifies: a constant θ degenerates
    // to one continent past sf0.01, a 2m cut exceeds the max occupancy
    // once m is large; SQRT on integers is IEEE exact-rounded and the
    // explicit FLOOR makes the integer cut identical in both engines —
    // a bare double→BIGINT cast would TRUNCATE in Spark but ROUND in
    // DuckDB) that touch — 8-adjacency —
    // merge into clusters,
    // labeled by their minimum cell id; points outside dense cells are
    // noise. The DBSCAN idea with the grid as the density estimator:
    // candidate generation stays the ONE (cx, cy) shuffle, and the
    // connectivity graph lives on CELLS, so the component computation
    // is bounded by the 432-cell grid at ANY corpus size — the
    // 100 TB-safe way to get density clusters without a point-level
    // epsilon graph, whose size grows with the corpus squared on a
    // fixed domain. Components come from the shared
    // [[graft.ops.Dedup.clusters]] min-label machinery (driver
    // union-find under its gated threshold — 432 nodes here — with the
    // distributed label-propagation fallback above it); the oracle
    // recomputes them INDEPENDENTLY: a recursive-CTE min-label walk
    // over a theta-joined adjacency, the independent-oracle discipline
    // of the other geo gates. As the corpus densifies on the fixed
    // domain, the ABSOLUTE occupancy grows — θ tracks it, disclosed,
    // and the noise row keeps the gate non-empty at every SF. With
    // the adaptive θ the cluster count stays O(10) at every SF —
    // singleton hot cells at sf0.001, merged hot regions above.
    QueryDef("q_geo_grid_cluster",
      (spark, sf) => {
        val cells = custPts(spark, sf)
          .select(expr(s"lat div $R").as("cx"), expr(s"lon div $R").as("cy"))
          .groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("npts"))
        val theta = cells.agg(greatest(lit(2L), expr(
          s"sum(npts) div ${LatCells * LonCells} + 2 * CAST(FLOOR(SQRT(CAST(" +
            s"sum(npts) div ${LatCells * LonCells} AS DOUBLE))) AS BIGINT)"))
          .as("theta"))
        val dense = cells.crossJoin(broadcast(theta))
          .filter(col("npts") >= col("theta"))
          .select((col("cx") * LonCells + col("cy")).as("cell"),
            col("cx"), col("cy"), col("npts"))
        val ring = dense
          .select(col("cell"), col("cx"), col("cy"),
            explode(expr(s"sequence(greatest(0L, cx - 1), " +
              s"least(${LatCells - 1}L, cx + 1))")).as("nx"))
          .select(col("cell"), col("nx"), col("cy"),
            explode(expr(s"sequence(greatest(0L, cy - 1), " +
              s"least(${LonCells - 1}L, cy + 1))")).as("ny"))
          .select(col("cell"), (col("nx") * LonCells + col("ny")).as("ncell"))
          .filter(col("cell") < col("ncell"))
        val pairs = ring
          .join(dense.select(col("cell").as("ncell")), Seq("ncell"))
          .select(col("cell").as("a"), col("ncell").as("b"))
        val labels = graft.ops.Dedup.clusters(pairs, idCol = "cell")
        val clustered = dense.join(labels, Seq("cell"), "left")
          .select(coalesce(col("rep"), col("cell")).as("cluster"),
            col("npts"))
          .groupBy(col("cluster"))
          .agg(count(lit(1)).as("n_cells"), sum(col("npts")).as("n_points"))
        val tot = cells.agg(sum(col("npts")).as("total"))
        val densePts = dense.agg(coalesce(sum(col("npts")), lit(0L)).as("dp"))
        val noise = tot.crossJoin(broadcast(densePts))
          .select(lit(-1L).as("cluster"), lit(0L).as("n_cells"),
            (col("total") - col("dp")).as("n_points"))
        clustered.unionByName(noise).orderBy(col("cluster"))
      },
      Some(s"""${OraclePts.replace("WITH c AS", "WITH RECURSIVE c AS")},
             |cells AS (
             |  SELECT lat // $R AS cx, lon // $R AS cy,
             |    CAST(COUNT(*) AS BIGINT) AS npts
             |  FROM c GROUP BY 1, 2),
             |theta AS (
             |  SELECT GREATEST(2, SUM(npts) // ${LatCells * LonCells}
             |    + 2 * CAST(FLOOR(SQRT(CAST(SUM(npts) // ${LatCells * LonCells}
             |      AS DOUBLE))) AS BIGINT)) AS theta FROM cells),
             |dense AS (
             |  SELECT cx * $LonCells + cy AS cell, cx, cy, npts
             |  FROM cells CROSS JOIN theta WHERE npts >= theta),
             |edges AS (
             |  SELECT d.cell AS a, n.cell AS b
             |  FROM dense d JOIN dense n
             |    ON abs(d.cx - n.cx) <= 1 AND abs(d.cy - n.cy) <= 1
             |    AND d.cell < n.cell),
             |walk(cell, lbl) AS (
             |  SELECT cell, cell FROM dense
             |  UNION
             |  SELECT CASE WHEN e.a = w.cell THEN e.b ELSE e.a END, w.lbl
             |  FROM walk w JOIN edges e ON e.a = w.cell OR e.b = w.cell),
             |lbl AS (SELECT cell, MIN(lbl) AS rep FROM walk GROUP BY cell),
             |clus AS (
             |  SELECT rep AS cluster, CAST(COUNT(*) AS BIGINT) AS n_cells,
             |    CAST(SUM(npts) AS BIGINT) AS n_points
             |  FROM dense JOIN lbl USING (cell) GROUP BY rep),
             |noise AS (
             |  SELECT CAST(-1 AS BIGINT) AS cluster,
             |    CAST(0 AS BIGINT) AS n_cells,
             |    (SELECT CAST(SUM(npts) AS BIGINT) FROM cells)
             |      - COALESCE((SELECT CAST(SUM(npts) AS BIGINT) FROM dense),
             |        0) AS n_points)
             |SELECT * FROM clus UNION ALL SELECT * FROM noise
             |ORDER BY cluster""".stripMargin)),
  )
}
