package graft.util

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism floor for row-cheap/work-heavy subtrees.
  *
  * A table that is tiny ON DISK (one parquet split) but feeds work that is
  * super-linear per row — a quadratic pair join's stream side, a
  * shingle/token explode that fans each row out hundreds of ways — executes
  * as ONE task, serializing the whole stage on one core. `upTo` inserts a
  * round-robin repartition to the cluster's parallelism, but ONLY when the
  * input has fewer partitions than that: at production scale the scan
  * already carries ≥ cores splits and the repartition (which would shuffle
  * the full table) vanishes. Parallelism is always derived from the cluster
  * (`defaultParallelism`), never a constant; the explicit partition count
  * keeps AQE from coalescing a tiny-by-bytes (heavy-by-work) shuffle back
  * to one partition.
  */
object Spread {
  def upTo(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
