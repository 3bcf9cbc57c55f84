package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `collect_list` with a hard per-group element budget, as a native
  * Catalyst [[TypedImperativeAggregate]].
  *
  * Why: the capped-bucket candidate generators (LSH postings,
  * Hamming bands — `LlmOps.lshCandidatePairs` / `hammingBandPairs`)
  * drop over-full buckets BEFORE pair expansion, but a plain
  * `collect_list` still materializes the doomed bucket's whole id
  * list in ONE aggregation buffer first — `collect_list`'s buffer is
  * the one structure in that plan that does not spill, so a single
  * degenerate key (all-empty docs at corpus scale) could hold O(d)
  * memory on one task before the size filter ever ran. This
  * aggregate stops accumulating at `cap + 1` elements: groups at or
  * under the cap collect EXACTLY (update order aside — callers sort),
  * and an over-cap group carries a truncated `cap + 1` witness list
  * whose true size the caller reads from a sibling `count(*)` — the
  * truncation is detectable (`size > cap`), never silent, and such
  * groups are filtered out before any row leaves the aggregate.
  *
  * Same execution path as `collect_list` (ObjectHashAggregate with
  * sort-based fallback); update/merge both enforce the budget, so
  * partial buffers on the map side are bounded too. Nulls are
  * skipped, matching `collect_list`.
  */
case class CappedCollectList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
  with UnaryLike[Expression] {

  require(cap >= 1, s"collect_list_capped: cap=$cap must be >= 1")

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  override def update(
      buffer: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    // budget = cap + 1: one element past the cap is kept so the caller
    // can SEE the overflow (size > cap) even without the sibling count
    if (buffer.length <= cap) {
      val v = child.eval(input)
      // copy: unsafe rows/strings handed to eval are transient views
      if (v != null) buffer += InternalRow.copyValue(v)
    }
    buffer
  }

  override def merge(
      buffer: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    var i = 0
    while (i < other.length && buffer.length <= cap) {
      buffer += other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  private lazy val projection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buffer: mutable.ArrayBuffer[Any]): Array[Byte] =
    projection.apply(InternalRow(new GenericArrayData(buffer.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val buffer = createAggregationBuffer()
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    // elements reference `bytes`, which is owned by this buffer alone
    row.getArray(0).foreach(child.dataType, (_, v: Any) => buffer += v)
    buffer
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedCollectList =
    copy(child = newChild)

  override def prettyName: String = "collect_list_capped"
}

object CappedCollect {

  /** Collect `c`'s non-null values per group, stopping at `cap + 1`
    * elements — bounded aggregation-buffer memory for degenerate hot
    * groups. Exact for groups of size <= cap; an over-cap group's list
    * is a truncated witness (detectable: `size(...) > cap`) that the
    * caller must drop (pair it with `count(*)` for the true size).
    */
  def collect_list_capped(c: Column, cap: Int): Column =
    GraftColumnBridge.column(
      CappedCollectList(GraftColumnBridge.expression(c), cap)
        .toAggregateExpression())
}
