package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint: h = Σ byte_i · B^(n-1-i)
  * mod 2^64 (B = 31, wrap-around multiply). The incremental/rolling
  * property (h(s[1..n]) derivable from h(s[0..n-1])) is what makes this
  * the standard fingerprint for windowed near-dup schemes (winnowing);
  * here it serves as a fast whole-document fingerprint.
  *
  * Native Catalyst expression with codegen — one pass over the UTF-8
  * bytes, no UDF boxing.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    RollingHash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object RollingHash64 {
  final val Base = 31L

  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * Base + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  def rolling_hash64(text: Column): Column =
    GraftColumnBridge.column(RollingHash64(GraftColumnBridge.expression(text)))
}
