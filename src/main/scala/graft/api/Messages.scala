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

  /** One stat-result chunk with the reference's full message envelope
    * (stats/incremental/user/entity.py:70-97): the stat family name, the
    * resolved window as epoch seconds, the entity, and EITHER the target
    * couchdb database (full runs) OR a database prefix (only-incremental
    * runs, where the webserver resolves the latest matching database —
    * entity.py:100-105). */
  final case class StatsChunk(
      msgType: String, statsRange: String,
      fromTs: Long, toTs: Long, entity: String,
      database: Option[String], databasePrefix: Option[String],
      rows: Seq[Row]) extends Message

  private def chunkIterator(
      df: DataFrame, chunkSize: Int, make: Seq[Row] => Message): Iterator[Message] = {
    val body = df.toLocalIterator()
    new Iterator[Message] {
      override def hasNext: Boolean = body.hasNext
      override def next(): Message = {
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (body.hasNext && buf.size < chunkSize) buf += body.next()
        make(buf.toSeq)
      }
    }
  }

  /** Stream `df` as DataStart, DataChunk*, DataEnd with `chunkSize` rows
    * per chunk. The consumer sees chunks in partition order; the iterator
    * is lazy end-to-end. */
  def chunked(df: DataFrame, database: String, chunkSize: Int): Iterator[Message] = {
    Iterator.single(DataStart(database)) ++
      chunkIterator(df, chunkSize, DataChunk(database, _)) ++
      Iterator.single(DataEnd(database))
  }

  /** Stream a stat result with the database envelope: couchdb_data_start,
    * enveloped chunks (25 items each, message_creator.py:59-63), then
    * couchdb_data_end — the bracket the webserver uses to create and seal
    * the target database (incremental/message_creator.py + background.py).
    *
    * Database resolution follows entity.py:100-110: an explicit `database`
    * wins; otherwise an only-incremental run sends the PREFIX
    * `entity_statsRange` (no bracket messages — the webserver appends to
    * the latest matching database), and a full run sends the default
    * database `entity_statsRange` bracketed by start/end. */
  def statsChunked(
      df: DataFrame, msgType: String, statsRange: String,
      fromTs: Long, toTs: Long, entity: String,
      database: Option[String] = None, onlyInc: Boolean = false,
      chunkSize: Int = 25): Iterator[Message] = {
    val defaultDb = s"${entity}_$statsRange"
    val (db, prefix) = database match {
      case Some(d) => (Some(d), None)
      case None if onlyInc => (None, Some(defaultDb))
      case None => (Some(defaultDb), None)
    }
    val body = chunkIterator(df, chunkSize,
      StatsChunk(msgType, statsRange, fromTs, toTs, entity, db, prefix, _))
    prefix match {
      case Some(_) => body // incremental: no database bracket
      case None =>
        Iterator.single(DataStart(db.get)) ++ body ++
          Iterator.single(DataEnd(db.get))
    }
  }
}
