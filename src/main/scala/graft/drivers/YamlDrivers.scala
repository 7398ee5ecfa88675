package graft.drivers

import graft.spec.{IdField, LongId, MigrationSpec, StringId}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Path ⇔ key codec shared by the YAML source and sink — parity with
  * `/root/reference/src/Drivers/YamlDriverTrait.php:51-85`: the last N
  * path segments of each file are the N id values in declared order, the
  * filename sans extension being the last id; on write, id values become
  * the directory/file path and are removed from the record body. This is
  * exactly Hive-style partition-path encoding, which is why the sink maps
  * onto `partitionBy`-like layout naturally.
  */
object YamlPathCodec {
  /** `group1/file1.yaml` + ids [g,n] → Seq("group1","file1"). The
    * extension strips case-insensitively so an uppercase `.YML` never
    * leaks into an id value (listing itself is case-sensitive — see
    * [[graft.sources.YamlFileIndex]] — this is defense in depth).
    */
  def idsFromPath(path: String, nIds: Int): Seq[String] = {
    val segs = path.split('/').filter(_.nonEmpty)
    val file = segs.last.replaceAll("(?i)\\.(yaml|yml)$", "")
    val dirs = segs.dropRight(1).takeRight(nIds - 1)
    dirs.toSeq :+ file
  }

  /** id values → `v1/v2/…/vN.yaml` (`YamlDriverTrait.php:75-85`). */
  def pathFromIds(values: Seq[String]): String =
    values.init.mkString("/") match {
      case "" => values.last + ".yaml"
      case d  => d + "/" + values.last + ".yaml"
    }
}

/** YAML directory scan: recursively reads `*.yaml`/`*.yml` under a
  * directory, skipping dotfiles, parses each file into a nested record
  * and derives key columns from the file path — parity with
  * `/root/reference/src/Drivers/Source/YamlSourceDriver.php:59-95` and
  * `YamlDriverTrait.php:28-63` (ids re-injected into the record).
  *
  * Spark has no native YAML reader. The scan is a proper file-source
  * relation ([[graft.sources.YamlRelation]]): a custom `FileIndex`
  * exposes the path⇔key codec as typed PARTITION COLUMNS (the
  * reference's `group/file.yaml` layout is Hive-style partition-path
  * encoding with the filename carrying the last key), so predicates on
  * id columns prune the file listing at plan time — no byte of a
  * non-matching entity is ever opened; a whole-file `FileFormat` then
  * parses each body (snakeyaml → JSON transcode → Spark's own
  * JacksonParser against the pruned required schema). Nested YAML
  * maps/lists surface as `StructType`/`ArrayType` columns. The body
  * schema is inferred once from a distributed transcode pass
  * (arbitrary-depth id trees — the reference's Finder recurses to any
  * depth, `YamlSourceDriver.php:69`); ids never live in bodies (the
  * sink strips them on write), so body and partition schemas are
  * disjoint by construction.
  */
final class YamlSourceDriver extends SourceDriver {
  def read(spark: SparkSession, spec: MigrationSpec): DataFrame = {
    import spark.implicits._
    val idNames = spec.sourceIds.map(_.name)
    val root = UriSchemes.path(spec.source)
    val index = new graft.sources.YamlFileIndex(spark, root, spec.sourceIds)
    // Body-schema inference needs a full transcode pass (YAML has no
    // footer metadata to prune on) — cache it per tree STATE (listing
    // fingerprint: paths+sizes+mtimes), so repeated reads of an
    // unchanged tree, including a pruned point lookup, never re-scan
    // the corpus just to re-learn the schema. A rewrite under the same
    // root changes the fingerprint and re-infers. The declared-schema
    // path (a schema registry) is the 100 TB endgame; fingerprint-
    // cached inference is its honest stand-in.
    // one live entry per root: a rewrite changes the fingerprint, and
    // keeping the superseded tree-state's schema around would grow the
    // cache for the session lifetime (every rewrite adds an entry)
    val cacheKey = (root, index.fingerprint)
    YamlSourceDriver.schemaCache.keys
      .filter(k => k._1 == root && k != cacheKey)
      .foreach(YamlSourceDriver.schemaCache.remove)
    val dataSchema = YamlSourceDriver.schemaCache.getOrElseUpdate(
      cacheKey, {
        // infer from the index's OWN accepted listing — not a second
        // recursive glob — so the file set feeding the schema is exactly
        // the file set the read will parse (a stray README.yaml the
        // index skips must not contribute columns, and the fingerprint,
        // computed over that same listing, then keys the cache honestly)
        val accepted = index.inputFiles
        if (accepted.isEmpty) org.apache.spark.sql.types.StructType(Nil)
        else {
        val raw = spark.read.format("binaryFile")
          .load(accepted.toIndexedSeq: _*)
          .select(col("content"))
          .as[Array[Byte]]
        val bodyJson: Dataset[String] = raw.flatMap { content =>
          // loadAll, matching the reader: consolidated files carry one
          // document per entity and every document must feed the schema
          val yaml = new org.yaml.snakeyaml.Yaml()
          val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
          import scala.jdk.CollectionConverters._
          yaml.loadAll(new String(content, "UTF-8")).asScala.map { doc =>
            val body = new java.util.LinkedHashMap[String, Object]()
            doc match {
              case m: java.util.Map[_, _] =>
                body.putAll(m.asInstanceOf[java.util.Map[String, Object]])
              case _ => ()
            }
            mapper.writeValueAsString(body)
          }.toSeq
        }
        // ids are path metadata, not body fields — exclude id-named
        // keys in case a foreign writer left them in
        val idNameSet = idNames.toSet
        org.apache.spark.sql.types.StructType(
          spark.read.json(bodyJson).schema.filterNot(f => idNameSet.contains(f.name)))
        }
      })
    val df = graft.sources.YamlRelation.read(spark, index, dataSchema)
    // ids first, body after — the column order the executor and sinks see
    df.select((idNames.map(col) ++ dataSchema.map(f => col(f.name))): _*)
  }
}

object YamlSourceDriver {
  /** (root, listing fingerprint) → inferred body schema. */
  private val schemaCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), org.apache.spark.sql.types.StructType]
}

/** YAML directory sink: one file per entity, id values encode the path
  * (multi-id ⇒ nested subdirs) and are removed from the record body —
  * parity with
  * `/root/reference/src/Drivers/Destination/YamlDestinationDriver.php:93-286`
  * (id-to-path + removal `:192-199`).
  *
  * Options, mirroring the reference's `setOption` surface (`:221-247`):
  *   - `indent`: block indentation width;
  *   - `refs`: anchor/alias generation — structurally identical non-scalar
  *     subtrees within a document are emitted once as `&anchor` and
  *     referenced as `*anchor` thereafter (the reference builds the same
  *     thing via a full value scan per document and documents it as "a
  *     slow process"; here it is one post-order hash pass per record);
  *   - `refsInclude`/`refsExclude`: per-path regex filters on which
  *     subtrees may anchor (`YamlDestinationDriver.php:221-247`, exercised
  *     by `tests/src/Drivers/Destination/YamlDestinationDriverTest.php:375-440`):
  *     a subtree's dotted key path (`mapping_field.inner_field`) must
  *     full-match an include pattern (empty include ⇒ all paths) and no
  *     exclude pattern. Non-matching subtrees serialize inline even when
  *     repeated; their children are still considered independently.
  *
  * Nested Spark values (struct/array/map columns) serialize as nested
  * YAML maps/lists, matching what the source reads back.
  *
  * Each partition writes its rows' files independently through the Hadoop
  * FS API, so the write parallelizes across executors; the reference
  * writes one file per entity too, just serially.
  *
  * == The millions-of-tiny-files guard (SURVEY §7.4, r17 verdict task 5) ==
  * The per-entity layout melts a namenode at 100×, so the sink now
  * BOUNDS it: a write of more than `maxEntities` rows (param; default
  * from `spark.graft.yaml.maxEntities`, else 1,000,000; ≤ 0 disables)
  * fails loudly BEFORE creating a single file, and the error names the
  * escape hatch — `consolidate = true`, which writes ONE multi-document
  * YAML stream per path PREFIX (the leading n−1 ids keep encoding the
  * path; the last id travels INSIDE each document): file count drops
  * from |entities| to |prefixes|. A consolidated tree rereads through
  * the same [[graft.sources.YamlFileFormat]] machinery (loadAll — one
  * row per document) by declaring the prefix ids as the tree's ids:
  * `src.read(spark, spec.copy(sourceIds = spec.sourceIds.init))`
  * surfaces the last id as an ordinary body column, and prefix-id
  * filters still prune the file listing.
  */
final class YamlDestinationDriver(
    indent: Int = 2, refs: Boolean = false,
    refsInclude: Seq[String] = Nil, refsExclude: Seq[String] = Nil,
    maxEntities: Option[Long] = None, consolidate: Boolean = false)
    extends DestinationDriver {
  override def supportsStubs: Boolean = false

  def snapshot(spark: SparkSession, spec: MigrationSpec): Option[DataFrame] =
    if (DestPath.exists(spark, UriSchemes.path(spec.destination))) {
      val src = new YamlSourceDriver
      val asSource = spec.copy(source = spec.destination, sourceIds = spec.destinationIds)
      try Some(src.read(spark, asSource)) catch { case _: Exception => None }
    } else None

  def write(df: DataFrame, spec: MigrationSpec): Unit = {
    val idNames = spec.destinationIds.map(_.name)
    val base = UriSchemes.path(spec.destination)
    val bodyCols = df.columns.filterNot(idNames.contains)
    val ind = indent
    val shareRefs = refs
    val incRes = refsInclude
    val excRes = refsExclude
    val spark = df.sparkSession
    // file-count guard: fail loudly BEFORE the first file lands (the
    // count is one columnar pass — nothing next to per-row fs.create)
    val cap = maxEntities.orElse(
      spark.conf.getOption("spark.graft.yaml.maxEntities").map(_.toLong))
      .getOrElse(1000000L)
    if (cap > 0 && !consolidate) {
      val n = df.count()
      if (n > cap) throw new IllegalStateException(
        s"YAML per-entity sink refuses $n entities (cap $cap): one file per " +
          "entity at this count is a small-files outage. Raise the cap " +
          "(maxEntities param / spark.graft.yaml.maxEntities; <= 0 disables) " +
          "only if the filesystem can take it, or write consolidated " +
          "multi-document files per path prefix (consolidate = true); the " +
          "Parquet sink remains the scale path.")
    }
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    if (consolidate) {
      require(idNames.size >= 2,
        "consolidated YAML needs >= 2 id levels: the leading ids form the " +
          "file path, the last id travels inside each document")
      val prefix = idNames.init
      val lastId = idNames.last
      // the same file-count cap, applied to what consolidation actually
      // creates: one file per PREFIX — a high-cardinality prefix melts
      // the namenode exactly like the per-entity layout would
      if (cap > 0) {
        val nPrefixes = df.select(prefix.map(col): _*).distinct().count()
        if (nPrefixes > cap) throw new IllegalStateException(
          s"consolidated YAML sink refuses $nPrefixes prefix files (cap $cap): " +
            "coarsen the path prefix or raise the cap (maxEntities param / " +
            "spark.graft.yaml.maxEntities; <= 0 disables)")
      }
      // each prefix's entities land in ONE task (repartition on the
      // prefix), sorted so a prefix's documents are consecutive and the
      // file order is deterministic (last id ascending)
      df.repartition(prefix.map(col): _*)
        .sortWithinPartitions(idNames.map(col): _*)
        .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
          val conf = confBc.value.value
          val opts = new org.yaml.snakeyaml.DumperOptions()
          opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
          opts.setIndent(ind)
          opts.setExplicitStart(true) // each document opens with `---`
          val yaml = new org.yaml.snakeyaml.Yaml(opts)
          val inc = incRes.map(java.util.regex.Pattern.compile)
          val exc = excRes.map(java.util.regex.Pattern.compile)
          var curKey: Seq[String] = null
          var out: org.apache.hadoop.fs.FSDataOutputStream = null
          try {
            rows.foreach { row =>
              val prefVals = prefix.map(n => String.valueOf(row.getAs[Any](n)))
              if (prefVals != curKey) {
                if (out != null) out.close()
                val p = new org.apache.hadoop.fs.Path(
                  base, YamlPathCodec.pathFromIds(prefVals))
                out = p.getFileSystem(conf).create(p, true)
                curKey = prefVals
              }
              val body = new java.util.LinkedHashMap[String, Object]()
              body.put(lastId, YamlDestinationDriver.toJava(row.getAs[Any](lastId)))
              bodyCols.foreach(c =>
                body.put(c, YamlDestinationDriver.toJava(row.getAs[Any](c))))
              val doc: Object =
                if (shareRefs)
                  YamlDestinationDriver.shareSubtrees(
                    body, new java.util.HashMap[Object, Object](), "", inc, exc)
                else body
              out.write(yaml.dump(doc).getBytes("UTF-8"))
            }
          } finally if (out != null) out.close()
        }
      return
    }
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val conf = confBc.value.value
      val opts = new org.yaml.snakeyaml.DumperOptions()
      opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
      opts.setIndent(ind)
      val yaml = new org.yaml.snakeyaml.Yaml(opts)
      val inc = incRes.map(java.util.regex.Pattern.compile)
      val exc = excRes.map(java.util.regex.Pattern.compile)
      rows.foreach { row =>
        val idVals = idNames.map(n => String.valueOf(row.getAs[Any](n)))
        val body = new java.util.LinkedHashMap[String, Object]()
        bodyCols.foreach(c => body.put(c, YamlDestinationDriver.toJava(row.getAs[Any](c))))
        val doc: Object =
          if (shareRefs)
            YamlDestinationDriver.shareSubtrees(
              body, new java.util.HashMap[Object, Object](), "", inc, exc)
          else body
        val p = new org.apache.hadoop.fs.Path(base, YamlPathCodec.pathFromIds(idVals))
        val fs = p.getFileSystem(conf)
        // yaml/yml double-match guard (`YamlDestinationDriver.php:156-163`):
        // a sibling .yml for the same ids would make the recursive source
        // read two rows with identical keys — fail the write instead.
        val twin = new org.apache.hadoop.fs.Path(
          p.getParent, p.getName.stripSuffix(".yaml") + ".yml")
        if (fs.exists(twin))
          throw new graft.spec.NonUniqueKeyException(
            s"both ${p.getName} and ${twin.getName} would exist for ids " +
              s"${idVals.mkString("/")} under $base")
        val out = fs.create(p, true)
        try out.write(yaml.dump(doc).getBytes("UTF-8")) finally out.close()
      }
    }
  }
}

object YamlDestinationDriver {
  /** Spark row values → plain Java structures snakeyaml serializes as
    * nested YAML (struct ⇒ map, array ⇒ list, map ⇒ map).
    */
  private[drivers] def toJava(v: Any): Object = v match {
    case null => null
    case r: org.apache.spark.sql.Row =>
      val m = new java.util.LinkedHashMap[String, Object]()
      r.schema.fieldNames.zipWithIndex.foreach { case (n, i) => m.put(n, toJava(r.get(i))) }
      m
    case s: scala.collection.Seq[_] =>
      val l = new java.util.ArrayList[Object]()
      s.foreach(x => l.add(toJava(x)))
      l
    case m: scala.collection.Map[_, _] =>
      val jm = new java.util.LinkedHashMap[String, Object]()
      m.foreach { case (k, x) => jm.put(String.valueOf(k), toJava(x)) }
      jm
    case other => other.asInstanceOf[Object]
  }

  /** Post-order canonicalization: structurally equal non-scalar subtrees
    * become the same object instance, which makes snakeyaml emit one
    * `&anchor` and `*alias` references — the set-wise equivalent of the
    * reference's per-document repeated-value scan
    * (`YamlDestinationDriver.php:221-247`).
    *
    * `path` is the dotted key path of `v` (list elements append their
    * index); a subtree is pooled — i.e. may become an anchor or alias —
    * only when its path full-matches the include/exclude filters.
    */
  private[drivers] def shareSubtrees(
      v: Object, pool: java.util.HashMap[Object, Object], path: String,
      include: Seq[java.util.regex.Pattern] = Nil,
      exclude: Seq[java.util.regex.Pattern] = Nil): Object = {
    def eligible: Boolean =
      (include.isEmpty || include.exists(_.matcher(path).matches())) &&
        !exclude.exists(_.matcher(path).matches())
    def childPath(k: String): String = if (path.isEmpty) k else path + "." + k
    def pooled(nv: Object): Object =
      if (!eligible) nv
      else {
        val prev = pool.get(nv)
        if (prev != null) prev else { pool.put(nv, nv); nv }
      }
    v match {
      case m: java.util.Map[_, _] =>
        val nm = new java.util.LinkedHashMap[String, Object]()
        m.forEach((k, x) => nm.put(String.valueOf(k),
          shareSubtrees(x.asInstanceOf[Object], pool, childPath(String.valueOf(k)),
            include, exclude)))
        pooled(nm)
      case l: java.util.List[_] =>
        val nl = new java.util.ArrayList[Object]()
        var i = 0
        l.forEach { x =>
          nl.add(shareSubtrees(x.asInstanceOf[Object], pool, childPath(i.toString),
            include, exclude))
          i += 1
        }
        pooled(nl)
      case other => other
    }
  }
}
