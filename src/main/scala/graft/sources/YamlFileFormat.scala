package graft.sources

import graft.drivers.YamlPathCodec
import graft.spec.IdField

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.execution.datasources.{FileFormat, FileIndex, HadoopFsRelation, LogicalRelation, OutputWriterFactory, PartitionDirectory, PartitionedFile}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** File-source integration for the YAML directory layout (SURVEY §7.3's
  * "DSv2 later"): the earlier `binaryFile` scan was distributed but
  * opaque — every query read EVERY file because Spark had no idea the
  * path encodes the keys. Here the path⇔key codec
  * ([[graft.drivers.YamlPathCodec]]) is surfaced as a partition schema
  * through a custom [[FileIndex]], so a filter on an id column prunes
  * the FILE LISTING before a single byte is opened — Hive-style
  * partition pruning over the reference's `group/file.yaml` layout,
  * where the FILENAME (not just directories) carries the last key.
  *
  * Scale shape: pruning happens at plan time against file metadata
  * (the listing), reads are whole-file per entity and embarrassingly
  * parallel, and the body parse reuses Spark's own JacksonParser after
  * a snakeyaml→JSON transcode, so nested YAML surfaces as native
  * struct/array columns with column pruning applied inside the parser
  * (requiredSchema, not the full document).
  */
object YamlRelation {

  /** Build the pruned-listing YAML DataFrame: ids from paths as typed
    * partition columns, body fields parsed per-file. `dataSchema` is
    * the body-only schema (id-named fields excluded — the sink strips
    * ids from bodies on write, so a roundtrip never carries them).
    */
  def read(
      spark: SparkSession, index: YamlFileIndex,
      dataSchema: StructType): DataFrame = {
    val relation = HadoopFsRelation(
      index, index.partitionSchema, dataSchema, None, new YamlFileFormat, Map.empty)(spark)
    GraftBridge.dataset(spark, LogicalRelation(relation, isStreaming = false))
  }
}

/** Listing + path⇔key partition metadata for a YAML entity tree. Each
  * file is its own partition (the last id IS the filename), so
  * `listFiles` evaluates partition filters per file — the pruning
  * granularity the layout actually has.
  */
final class YamlFileIndex(
    spark: SparkSession, root: String, idFields: Seq[IdField]) extends FileIndex {

  private val rootPath = new Path(root)

  // FileSystem-qualified root: the listing yields fully-qualified
  // absolute paths, so the relative-path computation in [[idValuesOf]]
  // must compare against the SAME qualified form — a bare relative root
  // ("out/dir", the documented UriSchemes.path shape) would otherwise
  // never prefix-match and every entity file would be skipped as
  // wrong-depth, silently reading the tree as empty.
  private lazy val qualifiedRootStr: String = rootPath
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
    .makeQualified(rootPath).toUri.getPath.stripSuffix("/")

  /** Ids decoded from a file's path, or None when the file is not a
    * well-formed entity of this tree — wrong depth below the root
    * (`group/file.yaml` trees have exactly one path segment per id) or
    * a segment that doesn't parse as the declared id type. A tree can
    * legitimately contain stray YAML (editor backups, a README.yaml);
    * crashing the whole read at listing time over one of them turns a
    * cosmetic mess into an outage, so such files are SKIPPED with a
    * warning instead (the old binaryFile path cast them to null
    * per-row — same policy, now at listing granularity).
    */
  private def idValuesOf(f: FileStatus): Option[InternalRow] = {
    // scheme-insensitive relative path (the listing yields file:-qualified
    // paths while the root may be a bare — even relative — local path)
    val rootStr = qualifiedRootStr
    val fileStr = f.getPath.toUri.getPath
    val rel =
      if (fileStr.startsWith(rootStr + "/")) fileStr.substring(rootStr.length + 1)
      else fileStr
    val depth = rel.split('/').count(_.nonEmpty)
    if (depth != idFields.size) {
      System.err.println(
        s"[graft] YamlFileIndex: skipping ${f.getPath} — depth $depth below " +
          s"root, expected ${idFields.size} (one path segment per id)")
      return None
    }
    val ids = YamlPathCodec.idsFromPath(f.getPath.toUri.getPath, idFields.size)
    try Some(InternalRow.fromSeq(idFields.zip(ids).map { case (fld, s) =>
      fld.idType.sparkType match {
        case LongType    => s.toLong
        case IntegerType => s.toInt
        case _           => UTF8String.fromString(s)
      }
    }))
    catch {
      case _: NumberFormatException =>
        System.err.println(
          s"[graft] YamlFileIndex: skipping ${f.getPath} — path segment does " +
            s"not parse as the declared id type")
        None
    }
  }

  private def listYamlFiles(): Seq[(InternalRow, FileStatus)] = {
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def recurse(p: Path): Seq[FileStatus] =
      fs.listStatus(p).toSeq
        .filterNot { s =>
          val n = s.getPath.getName
          n.startsWith(".") || n.startsWith("_")
        }
        .flatMap { s =>
          // case-SENSITIVE, matching the schema-inference scan's
          // `*.{yaml,yml}` glob exactly — the two passes must agree on
          // which files exist (a file only one of them sees is either
          // a crash or a silent schema hole)
          if (s.isDirectory) recurse(s.getPath)
          else if (s.getPath.getName.matches(".*\\.(yaml|yml)$")) Seq(s)
          else Nil
        }
    recurse(rootPath).flatMap(f => idValuesOf(f).map(_ -> f))
  }

  @volatile private var cachedFiles: Seq[(InternalRow, FileStatus)] = listYamlFiles()

  override def rootPaths: Seq[Path] = Seq(rootPath)

  override val partitionSchema: StructType =
    StructType(idFields.map(f => StructField(f.name, f.idType.sparkType, nullable = false)))

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val all = cachedFiles
    val kept =
      if (partitionFilters.isEmpty) all
      else {
        // bind id attributes to their slot in the per-file values row,
        // the same interpreted-predicate shape Spark's own
        // PartitioningAwareFileIndex uses for directory pruning
        val bound = Predicate.createInterpreted(
          partitionFilters.reduce(And).transform {
            case a: AttributeReference =>
              val i = partitionSchema.indexWhere(_.name.equalsIgnoreCase(a.name))
              require(i >= 0, s"unknown partition column ${a.name}")
              BoundReference(i, partitionSchema(i).dataType, nullable = true)
          })
        all.filter { case (values, _) => bound.eval(values) }
      }
    kept.map { case (values, f) => PartitionDirectory(values, Array(f)) }
  }

  override def inputFiles: Array[String] = cachedFiles.map(_._2.getPath.toString).toArray
  override def refresh(): Unit = cachedFiles = listYamlFiles()
  override def sizeInBytes: Long = cachedFiles.map(_._2.getLen).sum

  /** Content fingerprint of the current listing (paths, sizes, mtimes)
    * — the key that lets schema-inference results be cached per tree
    * STATE, not just per path, so a rewrite under the same root is
    * never served a stale schema. SHA-256 over the sorted listing: a
    * 32-bit hashCode across tree states collides often enough to serve
    * a stale schema in a long session.
    */
  def fingerprint: String = {
    val listing = cachedFiles
      .map { case (_, f) => s"${f.getPath}:${f.getLen}:${f.getModificationTime}" }
      .sorted.mkString("\n")
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(listing.getBytes("UTF-8"))
    s"${cachedFiles.size}/${digest.map("%02x".format(_)).mkString}"
  }
}

/** Whole-file YAML reader: snakeyaml parse → JSON transcode → Spark's
  * JacksonParser against the REQUIRED schema (pruned columns never
  * materialize). Never splitable — one YAML document is one row.
  */
final class YamlFileFormat extends FileFormat with Serializable {

  override def inferSchema(
      sparkSession: SparkSession, options: Map[String, String],
      files: Seq[FileStatus]): Option[StructType] = None // caller supplies

  override def prepareWrite(
      sparkSession: SparkSession, job: org.apache.hadoop.mapreduce.Job,
      options: Map[String, String], dataSchema: StructType): OutputWriterFactory =
    throw new UnsupportedOperationException(
      "YAML writes go through YamlDestinationDriver (path⇔key layout)")

  override def isSplitable(
      sparkSession: SparkSession, options: Map[String, String], path: Path): Boolean =
    false

  override def buildReader(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[org.apache.spark.sql.sources.Filter],
      options: Map[String, String],
      hadoopConf: org.apache.hadoop.conf.Configuration)
      : PartitionedFile => Iterator[InternalRow] = {
    val confBroadcast =
      sparkSession.sparkContext.broadcast(new SerializableConfiguration(hadoopConf))
    val holder = new YamlFileFormat.TaskState(
      requiredSchema, org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    (file: PartitionedFile) => {
      val path = file.toPath
      val fs = path.getFileSystem(confBroadcast.value.value)
      val in = fs.open(path)
      val bytes =
        try {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](65536)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          out.toByteArray
        } finally in.close()
      // snakeyaml's Yaml is NOT thread-safe and cheap to build — per
      // file; the mapper and the schema-compiled JacksonParser are
      // expensive and shared across every file the task reads.
      // loadAll: a file is a YAML STREAM — one document per entity in
      // the per-entity layout, many in the consolidated layout
      // (YamlDestinationDriver consolidate=true); single-doc files
      // yield exactly one document, so the classic layout is unchanged.
      val parsed = new org.yaml.snakeyaml.Yaml()
        .loadAll(new String(bytes, "UTF-8")).iterator()
      // an empty or whitespace-only file is an EMPTY stream under
      // loadAll where the old single-doc load returned one null
      // document — restore that: the entity exists (its ids derive
      // from the path), its body is all-null, so foreign-written
      // placeholder files don't silently vanish from reads
      val docs: java.util.Iterator[Object] =
        if (parsed.hasNext) parsed
        else java.util.Collections.singletonList(null: Object).iterator()
      new Iterator[InternalRow] {
        private var cur: Iterator[InternalRow] = Iterator.empty
        @annotation.tailrec
        private def advance(): Boolean =
          if (cur.hasNext) true
          else if (!docs.hasNext) false
          else {
            val doc = docs.next()
            val json = holder.mapper.writeValueAsString(
              if (doc == null) new java.util.LinkedHashMap[String, Object]() else doc)
            cur = holder.parser
              .parse[String](json, CreateJacksonParser.string, UTF8String.fromString)
              .iterator
            advance()
          }
        override def hasNext: Boolean = advance()
        override def next(): InternalRow = { advance(); cur.next() }
      }
    }
  }
}

object YamlFileFormat {
  /** Per-task parse machinery: the closure is deserialized once per
    * task, so these `@transient lazy val`s initialize once per task
    * (single-threaded) and amortize across every tiny file it reads —
    * the one-file-per-entity layout makes per-file construction of an
    * ObjectMapper/JacksonParser the dominant read cost otherwise.
    */
  private final class TaskState(schema: StructType, timeZone: String)
      extends Serializable {
    @transient lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    @transient lazy val parser =
      new JacksonParser(schema, new JSONOptions(Map.empty[String, String], timeZone), true, Nil)
  }
}
