package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Release token carried by every frame [[graft.operators.SeqIds.withSeqId]]
  * returns. Spark serializes task binaries (plan references + closures) on
  * the driver at EVERY job submission — also in local mode — so a
  * `writeObject` that throws once the token is invalidated turns
  * "re-executed a released id frame" from silent id corruption into a
  * driver-side `IllegalStateException` at submission time. Tokens ride the
  * codegen reference array (see [[SeqIdAdjustF.doGenCode]]), which is
  * exactly the payload each execution re-serializes.
  */
final class SeqIdReleaseToken extends Serializable {
  @volatile private var released = false
  def invalidate(): Unit = released = true
  def isReleased: Boolean = released

  @throws[java.io.IOException]
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    if (released) throw new IllegalStateException(
      "SeqIds: a frame from withSeqId was executed after its handle was " +
        "released. The per-partition offset map is only valid for the " +
        "partitioning pinned at assignment time; re-construct the frame " +
        "with a fresh withSeqId call instead.")
    out.defaultWriteObject()
  }
}

/** Per-partition id adjustment for the two-pass sequential-id operator:
  * `adjust(partition_id)`, where `adjust` folds the cumulative row offset
  * of the partition together with the `pid << 33`
  * `monotonically_increasing_id` base. Input is `spark_partition_id()`.
  *
  * Versus the former `element_at(typedlit(map))` formulation: the offset
  * array lives in the codegen reference array instead of a plan Literal,
  * the attached [[SeqIdReleaseToken]] makes post-release re-execution
  * throw at job submission, and a partition id OUTSIDE the pinned counts
  * (range-bound resampling drift — the silent-corruption case) throws at
  * evaluation instead of producing a null id. `Long.MinValue` marks
  * partitions that were empty when the counts pass ran; a legitimate
  * execution never routes a row there.
  */
case class SeqIdAdjustF(child: Expression, adjust: Array[Long],
                        token: SeqIdReleaseToken)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_seqid_adjust expects the int partition id, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_seqid_adjust"

  // public: invoked from Janino-generated code via the reference array
  def drift(pid: Int): Nothing = throw new IllegalStateException(
    s"SeqIds: row observed in partition $pid, which was empty when the " +
      "per-partition counts were collected — the input was re-executed " +
      "under a different range partitioning. Re-construct the frame with " +
      "a fresh withSeqId call.")

  override protected def nullSafeEval(p: Any): Any = {
    val pid = p.asInstanceOf[Int]
    if (pid < 0 || pid >= adjust.length || adjust(pid) == Long.MinValue) drift(pid)
    adjust(pid)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val adj = ctx.addReferenceObj("seqIdAdjust", adjust, "long[]")
    // unused in the generated code, but its presence in the reference
    // array is the point: references are re-serialized per job
    // submission, so a released token fails the submission
    ctx.addReferenceObj("seqIdToken", token, classOf[SeqIdReleaseToken].getName)
    val self = ctx.addReferenceObj("seqIdSelf", this, classOf[SeqIdAdjustF].getName)
    nullSafeCodeGen(ctx, ev, p => {
      s"""
         |if ($p < 0 || $p >= $adj.length || $adj[$p] == Long.MIN_VALUE) {
         |  $self.drift($p);
         |}
         |${ev.value} = $adj[$p];
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
