package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd bloom-filter membership probe over a long key.
  *
  * `right` must be a FOLDABLE binary literal holding a serialized
  * `org.apache.spark.util.sketch.BloomFilter` (the format
  * `DataFrameStatFunctions.bloomFilter` writes). The filter is
  * deserialized ONCE per task — lazily on the interpreted path, via a
  * codegen reference object on the compiled path — and each row costs
  * only the k hash probes of `mightContainLong`.
  *
  * This is the engine's runtime-filter primitive (reference context: the
  * listens⋈metadata joins in listenbrainz_spark/stats/incremental/ are
  * fact⋈selective-dim shapes where at 100 TB the dominant cost is
  * shuffling fact rows that cannot match). Spark's own
  * `spark.sql.optimizer.runtimeFilter.bloomFilter.enabled` plans the same
  * shape automatically when statistics justify it; exposing it as an
  * explicit operator ([[graft.operators.BloomPrune]]) makes the pruning
  * deterministic, composable pre-shuffle, and usable where the optimizer
  * lacks stats. The (b)-case custom-Expression rationale of
  * [[FloatVectorDot]] applies: built-ins can only express the probe as an
  * interpreted UDF, and this sits on every fact row of the hot path.
  *
  * Memory note: the serialized bytes travel in the `right` literal AND
  * the deserialized filter is pinned as a codegen reference object, so a
  * task transiently holds ~2× the filter size. Fine at the few-MB
  * filters this engine builds; if filter sizes ever grow to hundreds of
  * MB, replace the literal with a broadcast-variable-backed expression
  * so executors hold one shared copy.
  */
case class LongBloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"key must be bigint, got ${left.dataType}")
    else if (right.dataType != BinaryType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom bytes must be a foldable binary literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** Deserialized once per task; rebuilt from the literal after plan
    * serialization (the field is transient, the bytes travel in `right`).
    */
  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval().asInstanceOf[Array[Byte]]
    require(bytes != null, "bloom filter literal must not be null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(key: Any, bytesIgnored: Any): Any =
    bloom.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(
      "graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev,
      (key, _) => s"${ev.value} = $ref.mightContainLong($key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
