package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table-maintenance operators. At 100 TB the dominant operational costs
  * of a parquet lake are (a) small files — every scan pays per-file
  * open/footer overhead and the driver pays per-file listing — and (b)
  * retention — rewriting data to delete old rows is absurd when the
  * layout already partitions by date. Both fix at the storage layer, not
  * the query layer.
  */
object Maintenance {

  /** Compact a parquet directory to ~`targetBytes` per file: reads the
    * current snapshot, repartitions to ceil(total/target) partitions, and
    * promotes the rewrite via the crash-safe snapshot swap
    * ([[Merge.writeSnapshot]]). Returns the chosen file count.
    *
    * Round-robin repartition (not coalesce): coalesce merges existing
    * partitions without a shuffle but inherits their skew — a compaction
    * pass exists precisely because the current layout is bad, so pay the
    * one shuffle and emit uniform files. */
  def compact(spark: SparkSession, path: String, targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(path)
    Merge.writeSnapshot(df.repartition(nFiles), path)
    nFiles
  }

  /** Partition-level retention for a `col=value`-partitioned layout:
    * drops every partition directory whose string value sorts strictly
    * below `cutoff` (ISO dates sort correctly as strings). Pure metadata
    * work — no data is read or rewritten, which is the only form of
    * retention that stays O(partitions) at any table size. Returns the
    * dropped partition values. Row-level retention (the reference's
    * DATEADD delete, SURVEY.md §2.6 M2) remains [[Retention.retain]];
    * this is its layout-aware fast path when the retention key IS the
    * partition key. */
  def dropPartitionsBefore(spark: SparkSession, path: String,
      partitionCol: String, cutoff: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val prefix = s"$partitionCol="
    val dropped = fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .map(st => st.getPath)
      .filter(_.getName.stripPrefix(prefix) < cutoff)
    dropped.foreach(d => fs.delete(d, true))
    dropped.map(_.getName.stripPrefix(prefix)).sorted
  }
}
