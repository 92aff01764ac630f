package graft.ingest

import java.io.{InputStream, OutputStream}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.io.compress._
import org.apache.spark.sql.SparkSession

/** Pure-JVM zstd codec for Hadoop's compression-codec factory.
  *
  * Hadoop's own `ZStandardCodec` needs libhadoop compiled with zstd
  * support, which many deployments (including this container) lack — so a
  * `.txt.zst` MLHD corpus (reference mlhd/download.py:63-106 decompresses
  * zst explicitly) would be unreadable. This codec routes `.zst` through
  * zstd-jni, which Spark already bundles for parquet/shuffle compression:
  * no native hadoop build required, works wherever Spark runs.
  *
  * [[ZstdJniCodec.install]] registers it on a session's Hadoop conf; after
  * that every text/CSV read resolves `.zst` files through this codec
  * (CompressionCodecFactory maps codecs by file extension). Like gzip,
  * zstd files are NOT splittable — one file is one input split — which
  * matches the MLHD layout of many small per-user files. The Compressor /
  * Decompressor pool objects are inert placeholders: compression happens
  * in the wrapped streams, the shape Hadoop itself uses for its built-in
  * (non-native) gzip path.
  */
class ZstdJniCodec extends CompressionCodec {

  override def getDefaultExtension: String = ".zst"

  override def createInputStream(in: InputStream): CompressionInputStream =
    new ZstdJniCodec.In(in)

  override def createInputStream(
      in: InputStream, d: Decompressor): CompressionInputStream =
    createInputStream(in)

  override def getDecompressorType: Class[_ <: Decompressor] =
    classOf[ZstdJniCodec.InertDecompressor]

  override def createDecompressor(): Decompressor =
    new ZstdJniCodec.InertDecompressor

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new ZstdJniCodec.Out(out)

  override def createOutputStream(
      out: OutputStream, c: Compressor): CompressionOutputStream =
    createOutputStream(out)

  override def getCompressorType: Class[_ <: Compressor] =
    classOf[ZstdJniCodec.InertCompressor]

  override def createCompressor(): Compressor =
    new ZstdJniCodec.InertCompressor
}

object ZstdJniCodec {

  /** The stock hadoop-common codecs (the ServiceLoader set). Setting
    * `io.compression.codecs` REPLACES the discovered list, so the stock
    * codecs must be restated alongside this one; ours is appended last so
    * its `.zst` mapping wins over the native-only ZStandardCodec. */
  private val StockCodecs = Seq(
    "org.apache.hadoop.io.compress.DefaultCodec",
    "org.apache.hadoop.io.compress.GzipCodec",
    "org.apache.hadoop.io.compress.BZip2Codec",
    "org.apache.hadoop.io.compress.DeflateCodec",
    "org.apache.hadoop.io.compress.SnappyCodec",
    "org.apache.hadoop.io.compress.Lz4Codec")

  /** Register the codec on `spark`'s Hadoop configuration: subsequent
    * text/CSV reads resolve `.zst` through zstd-jni. Idempotent. */
  def install(spark: SparkSession): Unit = {
    val key = "io.compression.codecs"
    val conf: Configuration = spark.sparkContext.hadoopConfiguration
    val cls = classOf[ZstdJniCodec].getName
    val existing = Option(conf.get(key))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(StockCodecs)
    conf.set(key, (existing.filterNot(_ == cls) :+ cls).mkString(","))
  }

  private final class In(raw: InputStream)
      extends CompressionInputStream(raw) {
    // continuous mode: multi-frame files (zstd CLI output can be) read
    // through to underlying EOF, matching plain-file semantics
    private val z =
      new com.github.luben.zstd.ZstdInputStream(raw).setContinuous(true)
    override def read(): Int = z.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      z.read(b, off, len)
    override def resetState(): Unit = () // single-stream files; never reset
    override def close(): Unit =
      try z.close() finally super.close()
  }

  private final class Out(raw: OutputStream)
      extends CompressionOutputStream(raw) {
    private val z = new com.github.luben.zstd.ZstdOutputStream(raw)
    z.setCloseFrameOnFlush(true)
    private var zClosed = false
    override def write(b: Int): Unit = z.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      z.write(b, off, len)
    // CompressionOutputStream.close() calls finish() BEFORE closing the
    // underlying stream, so finish() must be a no-op once the zstd stream
    // is closed — flushing a closed ZstdOutputStream throws
    override def finish(): Unit = if (!zClosed) z.flush() // closes the frame
    override def resetState(): Unit = ()
    override def close(): Unit =
      try { if (!zClosed) { zClosed = true; z.close() } }
      finally super.close()
  }

  /** Pool placeholder — never performs work (streams do), but CodecPool
    * insists on borrowing one per reader/writer. */
  private[ingest] final class InertDecompressor extends Decompressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def needsInput(): Boolean = true
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def getRemaining: Int = 0
    override def needsDictionary(): Boolean = false
    override def finished(): Boolean = true
    override def decompress(b: Array[Byte], off: Int, len: Int): Int = 0
    override def reset(): Unit = ()
    override def end(): Unit = ()
  }

  private[ingest] final class InertCompressor extends Compressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def needsInput(): Boolean = true
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def getBytesRead: Long = 0L
    override def getBytesWritten: Long = 0L
    override def finish(): Unit = ()
    override def finished(): Boolean = true
    override def compress(b: Array[Byte], off: Int, len: Int): Int = 0
    override def reset(): Unit = ()
    override def end(): Unit = ()
    override def reinit(conf: Configuration): Unit = ()
  }
}
