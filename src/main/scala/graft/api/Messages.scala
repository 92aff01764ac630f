package graft.api

import org.apache.spark.sql.{DataFrame, Row}

/** Result emission: the reference streams stat results to the webserver as
  * chunked messages bracketed by start/end markers
  * (stats/incremental/user/entity.py:70-97, message_creator.py:59-72 —
  * 25 users per stats message, 10k rows per similarity message).
  *
  * `toLocalIterator` streams one partition at a time to the driver — the
  * whole result never materializes driver-side, which is what lets a
  * 100 TB-scale job emit millions of rows through a small driver heap.
  */
object Messages {

  sealed trait Message
  final case class DataStart(database: String) extends Message
  final case class DataChunk(database: String, rows: Seq[Row]) extends Message
  final case class DataEnd(database: String) extends Message

  /** Stream `df` as DataStart, DataChunk*, DataEnd with `chunkSize` rows
    * per chunk. The consumer sees chunks in partition order; the iterator
    * is lazy end-to-end. */
  def chunked(df: DataFrame, database: String, chunkSize: Int): Iterator[Message] = {
    val body = df.toLocalIterator()
    Iterator.single(DataStart(database)) ++
      new Iterator[Message] {
        override def hasNext: Boolean = body.hasNext
        override def next(): Message = {
          val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
          while (body.hasNext && buf.size < chunkSize) buf += body.next()
          DataChunk(database, buf.toSeq)
        }
      } ++
      Iterator.single(DataEnd(database))
  }
}
