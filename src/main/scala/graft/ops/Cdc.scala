package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Change-data-capture apply: compact an I/U/D operation log and merge
  * it into a keyed snapshot — the Debezium-consumer shape, and the
  * explicit-delete complement to the executor's orphan INFERENCE (an
  * op log states deletes; orphan detection derives them from absence).
  *
  * Scale shape: one key-shuffled window compacts the log to its latest
  * op per key (at 100 TB the log is hours of changes — small next to
  * the snapshot), then ONE full-outer merge on the same key applies it;
  * with a bucketed snapshot layout the merge side carries its
  * partitioning from the files. No driver-side state.
  */
object Cdc {

  /** Derive a change log by DIFFING two snapshots — the inverse of
    * [[applyLog]] and the `table_changes`/generation-diff op a lakehouse
    * exposes between any two retained generations: one co-partitioned
    * full outer join on the key classifies every row as
    * inserted / deleted / updated / unchanged (value comparison is
    * null-safe per column). Output: key columns + `change`. The join is
    * the only exchange; nothing is hashed row-wise on the driver, so
    * the diff scales exactly like a join of the two snapshots.
    */
  def snapshotDiff(oldDf: org.apache.spark.sql.DataFrame,
      newDf: org.apache.spark.sql.DataFrame,
      keys: Seq[String], valueCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, when}
    val o = oldDf.select((keys ++ valueCols).map(col): _*)
      .toDF(keys ++ valueCols.map("__o_" + _): _*)
      .withColumn("__in_old", lit(1))
    val n = newDf.select((keys ++ valueCols).map(col): _*)
      .toDF(keys ++ valueCols.map("__n_" + _): _*)
      .withColumn("__in_new", lit(1))
    val joined = o.join(n, keys, "full_outer")
    val changed = valueCols
      .map(v => !(col(s"__o_$v") <=> col(s"__n_$v")))
      .reduce(_ || _)
    joined.select(keys.map(col) :+
      when(col("__in_old").isNull, lit("inserted"))
        .when(col("__in_new").isNull, lit("deleted"))
        .when(changed, lit("updated"))
        .otherwise(lit("unchanged")).as("change"): _*)
  }

  /** Apply `log` to `snapshot`. `log` columns: `key`, the `seqCols`
    * (commit order — latest wins, ties broken by the later seq column),
    * `opCol` with values I/U/D, and the snapshot's payload columns
    * (ignored for D). I and U are both upserts (insert-or-replace, the
    * standard consumer simplification); D removes the key. Rows of the
    * snapshot untouched by the log pass through unchanged.
    */
  def applyLog(
      snapshot: DataFrame, log: DataFrame, key: String,
      opCol: String, seqCols: Seq[String]): DataFrame = {
    require(seqCols.nonEmpty, "need at least one sequence column")
    val payload = snapshot.columns.filterNot(_ == key).toSeq
    // the contract is exactly I/U/D — a malformed op code applied as an
    // upsert would silently null out the key's payload, so fail loudly.
    // Validation is a sort key of the compaction window (below), so it
    // evaluates on EVERY log row, superseded ones included — a bad op
    // code anywhere in the log is a broken producer, not just a bad
    // final state.
    val validatedOp = when(col(opCol).isin("I", "U", "D"), col(opCol))
      .otherwise(raise_error(concat(
        lit("Cdc.applyLog: unknown op code '"), col(opCol), lit("' (expected I/U/D)"))))
    // fully-tied seqCols would otherwise pick a nondeterministic
    // row_number winner: break first by the validated op, then by a
    // hash of the row, so replays compact identically. Map-typed
    // columns are excluded from the hash — Spark rejects hashing maps
    // (key order is undefined), and a log that differs only inside a
    // map payload at identical (seq, op) has no principled winner
    // anyway.
    def hashable(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case m: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val hashCols = log.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    val tieBreak: Seq[org.apache.spark.sql.Column] =
      if (hashCols.isEmpty) Nil else Seq(xxhash64(hashCols.toSeq: _*).asc)
    val w = Window.partitionBy(col(key)).orderBy(
      (seqCols.map(c => col(c).desc) :+ validatedOp.asc) ++ tieBreak: _*)
    val latest = log
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(key) +: validatedOp.as("__op") +:
        payload.map(c => col(c).as(s"__new_$c")): _*)
    snapshot.join(latest, Seq(key), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(col(key) +: payload.map { c =>
        when(col("__op").isNotNull, col(s"__new_$c")).otherwise(col(c)).as(c)
      }: _*)
  }
}
