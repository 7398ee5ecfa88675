package graft.drivers

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import java.sql.{DriverManager, Types}
import scala.collection.mutable.ArrayBuffer

/** Driver-local JDBC I/O for EMBEDDED databases.
  *
  * Spark's standard JDBC source/sink opens connections on the
  * executors — the right shape for any network database, and the one
  * every non-embedded URL here keeps. But an embedded engine
  * (`jdbc:derby:<path>` with no network host) is an in-process store:
  * the database lives inside the driver JVM and is, by Derby's design,
  * bootable by ONE JVM at a time. Under a real multi-JVM deployment
  * (proved by the local-cluster sweep, see BENCH_NOTES) an executor
  * can never reach it — not a scale bug but a definitional property of
  * in-process databases, which exist only in test/dev rigs. So for
  * embedded URLs the engine routes the row stream through the driver:
  * reads materialize the statement result into a local DataFrame;
  * writes pull `toLocalIterator` (one partition in memory at a time)
  * through the same batched statements the executor path binds.
  *
  * The reference runs everything in one PHP process
  * (`/root/reference/src/Drivers/Source/DbalSourceDriver.php:67-139`),
  * so its Doctrine sources/sinks are "driver-local" by construction;
  * this object is the faithful analog for the one database engine the
  * test environment ships.
  */
object DriverLocalJdbc extends Serializable {

  /** An embedded (in-process, single-JVM) JDBC URL: Derby without a
    * network host. `jdbc:derby://host/...` (client/server) is NOT
    * embedded and keeps the distributed path.
    */
  def isEmbedded(url: String): Boolean =
    url.startsWith("jdbc:derby:") && !url.startsWith("jdbc:derby://")

  private def sparkType(md: java.sql.ResultSetMetaData, i: Int): DataType =
    md.getColumnType(i) match {
      case Types.BIGINT => LongType
      case Types.INTEGER | Types.SMALLINT | Types.TINYINT => IntegerType
      case Types.DOUBLE | Types.FLOAT => DoubleType
      case Types.REAL => FloatType
      case Types.BOOLEAN | Types.BIT => BooleanType
      case Types.TIMESTAMP => TimestampType
      case Types.DATE => DateType
      case Types.DECIMAL | Types.NUMERIC =>
        DecimalType(math.max(md.getPrecision(i), 1), math.max(md.getScale(i), 0))
      case _ => StringType
    }

  /** Execute `sql` on a driver-side connection and return the result as
    * a local DataFrame (schema from `ResultSetMetaData`, the same type
    * mapping the executor-side JDBC reader would produce).
    */
  def read(spark: SparkSession, url: String, sql: String,
      driverClass: Option[String]): DataFrame = {
    driverClass.foreach(Class.forName)
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(sql)
        val md = rs.getMetaData
        val n = md.getColumnCount
        val fields = (1 to n).map(i => StructField(md.getColumnLabel(i), sparkType(md, i)))
        val schema = StructType(fields)
        val buf = ArrayBuffer.empty[Row]
        while (rs.next()) {
          val vals = (1 to n).map { i =>
            val v: Any = fields(i - 1).dataType match {
              case LongType => rs.getLong(i)
              case IntegerType => rs.getInt(i)
              case DoubleType => rs.getDouble(i)
              case FloatType => rs.getFloat(i)
              case BooleanType => rs.getBoolean(i)
              case TimestampType => rs.getTimestamp(i)
              case DateType => rs.getDate(i)
              case _: DecimalType => rs.getBigDecimal(i)
              case _ => rs.getString(i)
            }
            if (rs.wasNull()) null else v
          }
          buf += Row.fromSeq(vals)
        }
        import scala.jdk.CollectionConverters._
        spark.createDataFrame(buf.asJava, schema)
      } finally st.close()
    } finally conn.close()
  }

  /** Bind `rows` to `sql` in `bindOrder` column order (NULLs carry the
    * column's JDBC type code — strict databases reject untyped NULLs)
    * and execute in `batchSize` batches over one connection. Called
    * driver-side for embedded URLs and from `foreachPartition` on the
    * executor path — the SAME binding code either way.
    */
  def execBatched(url: String, sql: String, rows: Iterator[Row],
      bindOrder: Seq[String], typeCodes: Map[String, Int], batchSize: Int,
      driverClass: Option[String]): Unit = {
    if (rows.nonEmpty) {
      driverClass.foreach(Class.forName)
      val conn = DriverManager.getConnection(url)
      conn.setAutoCommit(false)
      try {
        val ps = conn.prepareStatement(sql)
        var n = 0
        rows.foreach { row =>
          var p = 1
          bindOrder.foreach { c =>
            val v = row.getAs[Any](c)
            if (v == null) ps.setNull(p, typeCodes(c)) else ps.setObject(p, v)
            p += 1
          }
          ps.addBatch()
          n += 1
          if (n % batchSize == 0) ps.executeBatch()
        }
        ps.executeBatch()
        conn.commit()
        ps.close()
      } finally conn.close()
    }
  }
}
