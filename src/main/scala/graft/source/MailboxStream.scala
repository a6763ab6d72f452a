package graft.source

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Streaming extension of the mailbox source (beyond the batch-only
  * reference): new `*.mbx` files appearing under the glob are picked up
  * per micro-batch — mail-archive ingestion as a stream.
  *
  * Offsets are the sorted set of files already processed (files are
  * immutable drops, like the reference's PST archives); each batch plans
  * partitions for exactly the new files with the same planner/pushdown
  * machinery as the batch path.
  */
class MailboxMicroBatchStream(
    opts: MailboxOptions,
    readSchema: StructType,
    classFilter: Option[String]) extends MicroBatchStream {

  /** Offset = files seen so far (newline-joined in the JSON form). */
  case class FilesOffset(files: Seq[String]) extends Offset {
    override def json(): String =
      files.sorted.mkString("\n")
  }

  private def parseOffset(o: Offset): Seq[String] = o match {
    case FilesOffset(fs) => fs
    case other =>
      val s = other.json()
      if (s.isEmpty) Nil else s.split("\n").toSeq
  }

  override def initialOffset(): Offset = FilesOffset(Nil)

  override def latestOffset(): Offset =
    FilesOffset(MailboxPlanner.globFiles(opts.path))

  override def deserializeOffset(json: String): Offset =
    FilesOffset(if (json.isEmpty) Nil else json.split("\n").toSeq)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen    = parseOffset(start).toSet
    val newOnes = parseOffset(end).filterNot(seen)
    if (newOnes.isEmpty) Array.empty
    else {
      // plan only the new files, one glob-free pass each
      val perFile = newOnes.sorted.flatMap { f =>
        MailboxPlanner
          .plan(MailboxOptions(opts.raw + ("path" -> f)), classFilter)
      }
      perFile.zipWithIndex
        .map { case (p, i) => p.copy(index = i) }
        .toArray[InputPartition]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MailboxReaderFactory(readSchema, opts, countStar = false)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
