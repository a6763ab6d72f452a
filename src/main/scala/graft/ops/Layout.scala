package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Output-side data layout for curated corpora (builder-brief extension):
  * how a 100 TB pipeline WRITES matters as much as how it reads. A
  * curated training shard wants (a) directory partitioning on a coarse
  * column so downstream scans prune whole directories, (b) rows sorted
  * within files so min/max footer stats make predicate pushdown
  * selective, and (c) bounded file sizes so no task ever reads a
  * multi-GB straggler file.
  */
object Layout {

  /** Write `df` as a curated parquet layout: directory-partitioned by
    * `partCol`, sorted by (`partCol`, `sortCol`) within partitions (so
    * each file covers a narrow `sortCol` range → tight footer min/max),
    * at most `maxRecordsPerFile` rows per file.
    *
    * The `repartition(partCol)` shuffle routes each directory partition
    * to one task — at scale, raise the partition count with
    * `repartition(n, col)` or add a bucketing column so a huge
    * directory splits across writers; `maxRecordsPerFile` then caps
    * file sizes regardless.
    */
  def curatedWrite(df: DataFrame, dir: String, partCol: String,
      sortCol: String, maxRecordsPerFile: Long): Unit =
    df.repartition(col(partCol))
      .sortWithinPartitions(col(partCol), col(sortCol))
      .write
      .partitionBy(partCol)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(dir)

  /** q_curated_write — end-to-end layout round trip: documents written
    * lang-partitioned / doc_id-sorted / size-bounded, then read back
    * through the partitioned layout. The oracle checks content
    * fidelity; the layout itself (directories, in-file ordering, file
    * row caps) is asserted in LayoutSpec.
    */
  val qCuratedWrite = Q(
    "q_curated_write",
    (s, d) => {
      val out = java.nio.file.Files
        .createTempDirectory("curated_write").resolve("docs").toString
      curatedWrite(Tables.documents(s, d), out,
        partCol = "lang", sortCol = "doc_id", maxRecordsPerFile = 100L)
      s.read.parquet(out)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    },
    Some(
      """SELECT doc_id, lang, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(qCuratedWrite)
}
