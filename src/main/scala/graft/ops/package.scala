package graft

import org.apache.spark.sql.DataFrame

package object ops {
  /** Spread a DataFrame across the cluster before CPU-heavy per-row work.
    *
    * Small-file inputs (one parquet file ⇒ one partition) serialize
    * signature computation onto a single core; a 100 TB input arrives in
    * thousands of splits and is left untouched. Round-robin repartition
    * (not range/hash) because the downstream op is embarrassingly
    * parallel per row.
    */
  private[ops] def ensureParallelism(df: DataFrame): DataFrame = {
    // Streaming plans can't be probed via .rdd (and micro-batch
    // parallelism is the source's business) — pass them through so the
    // codec ops compose with readStream.
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
