package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sparse-sign random projection (Achlioptas 2003 /
  * Johnson–Lindenstrauss): embed d-dimensional vectors into k ≪ d
  * dimensions with a ±1 sign matrix, preserving pairwise distances
  * within (1±ε) — the dimensionality-reduction front end for ANN
  * indexing and clustering when the raw embedding width is the cost
  * driver (k·n floats instead of d·n cross every shuffle).
  *
  * The sign matrix is PLAN-TIME CONSTANT: sign(j,k) = +1 iff the
  * first hex char of `md5("rp:" j ":" k ":" salt)` is 0-7, resolved
  * in Scala while BUILDING the expression — the executors never hash
  * anything. Each output dimension is one codegen'd chain
  * `(±v[1] ±v[2] … ±v[d]) / sqrt(k)` in FIXED left-associative order:
  * float elements widen to double exactly, IEEE addition replays
  * bit-identically in any engine evaluating the same chain (the
  * engine's fixed-order discipline from the chi-square statistic),
  * and [[oracleExprs]] emits the SAME chain as SQL so oracles match
  * without rounding.
  *
  * Scale shape (100 TB of vectors): map-only, zero shuffles, d·k
  * multiply-adds per row inside whole-stage codegen. The matrix never
  * materializes anywhere.
  */
object RandomProjection {

  private def sign(j: Int, k: Int, salt: String): Int = {
    val mdi = java.security.MessageDigest.getInstance("MD5")
    val h = mdi.digest(s"rp:$j:$k:$salt".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xf) < 8) 1 else -1
  }

  /** `df` plus k projection columns `p0..p(k-1)`.
    *
    * @param vecCol array&lt;float&gt; or array&lt;double&gt; column
    * @param inDim  d, the input width (elements 1..d are read)
    * @param outDim k, the projected width
    */
  def project(
      df: DataFrame, vecCol: Column, inDim: Int, outDim: Int,
      salt: String = "g"): DataFrame = {
    require(inDim >= 1 && outDim >= 1 && outDim <= inDim,
      s"need 1 <= outDim <= inDim, got d=$inDim k=$outDim")
    (0 until outDim).foldLeft(df) { case (acc, k) =>
      val chain = (0 until inDim).foldLeft(lit(0.0): Column) {
        case (a, j) =>
          val term = element_at(vecCol, j + 1).cast("double")
          if (sign(j, k, salt) > 0) a + term else a - term
      }
      acc.withColumn(s"p$k", chain / sqrt(lit(outDim.toDouble)))
    }
  }

  /** The SAME chains as DuckDB SQL over a DOUBLE[] column named
    * `vecSql` — `p0..p(k-1)` select expressions for oracles. */
  def oracleExprs(
      vecSql: String, inDim: Int, outDim: Int,
      salt: String = "g"): Seq[String] =
    (0 until outDim).map { k =>
      val chain = (0 until inDim).map { j =>
        val op = if (sign(j, k, salt) > 0) "+" else "-"
        s"$op $vecSql[${j + 1}]"
      }.mkString(" ")
      s"(0.0 $chain) / sqrt(${outDim.toDouble}) AS p$k"
    }
}
