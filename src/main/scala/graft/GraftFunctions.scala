package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{MinHashBandKeys, MinHashSignature, RollingHash64, SimHash64, WordShingles}

/** SQL registration of graft's native Catalyst expressions, so the whole
  * operator surface is reachable from `spark.sql(...)` — not only the
  * Scala Column API:
  *
  *   SELECT graft_simhash64(split(text, ' ')) FROM docs
  *
  * Two entry points with identical registrations:
  *   - [[GraftExtensions]] for `spark.sql.extensions` /
  *     `builder.withExtensions` (new sessions);
  *   - [[GraftFunctions.register]] for an already-running session.
  */
object GraftFunctions {

  private def lit(e: Expression, what: String): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(s"$what must be a literal integer")
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$what must be a literal integer, got $other")
    }
  }

  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(s"$name expects $n arguments, got ${args.length}")

  /** (name, builder) for every exposed function. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_word_shingles" -> { args =>
      arity("graft_word_shingles", args, 2)
      WordShingles(args.head, lit(args(1), "n"))
    },
    "graft_simhash64" -> { args =>
      arity("graft_simhash64", args, 1)
      SimHash64(args.head)
    },
    "graft_rolling_hash64" -> { args =>
      arity("graft_rolling_hash64", args, 1)
      RollingHash64(args.head)
    },
    "graft_minhash_signature" -> { args =>
      arity("graft_minhash_signature", args, 2)
      MinHashSignature(args.head, lit(args(1), "k"))
    },
    "graft_minhash_band_keys" -> { args =>
      arity("graft_minhash_band_keys", args, 3)
      MinHashBandKeys(args.head, lit(args(1), "bands"), lit(args(2), "rows"))
    },
    // graft_perceptron_margin(text, array(w0, ..., w_{b-1}, bias)):
    // the q61 serving kernel from SQL — weights must be a literal
    // array (the model is a plan constant, not a per-row input)
    "graft_perceptron_margin" -> { args =>
      arity("graft_perceptron_margin", args, 2)
      if (!args(1).foldable)
        throw new IllegalArgumentException(
          "graft_perceptron_margin weights must be a literal array")
      import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}
      def noNulls(a: org.apache.spark.sql.catalyst.util.ArrayData): Unit =
        if ((0 until a.numElements()).exists(a.isNullAt))
          throw new IllegalArgumentException(
            "graft_perceptron_margin weights must not contain NULL elements")
      val evaluated = args(1).eval()
      // a foldable NULL (e.g. CAST(NULL AS ARRAY<BIGINT>)) has the right
      // TYPE, so report the null VALUE before the type dispatch — the
      // catch-all's "must be array<bigint|int>, got ArrayType(...)"
      // would mislead
      if (evaluated == null)
        throw new IllegalArgumentException(
          "graft_perceptron_margin weights must not be NULL")
      val arr = (args(1).dataType, evaluated) match {
        case (ArrayType(LongType, _),
            a: org.apache.spark.sql.catalyst.util.ArrayData) =>
          noNulls(a); a.toLongArray()
        case (ArrayType(IntegerType, _),
            a: org.apache.spark.sql.catalyst.util.ArrayData) =>
          noNulls(a); a.toIntArray().map(_.toLong)
        case (dt, _) => throw new IllegalArgumentException(
          s"graft_perceptron_margin weights must be array<bigint|int>, got $dt")
      }
      graft.functions.PerceptronMarginF(args.head, arr)
    })

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  /** Register into a live session (idempotent). Also registers the
    * heavy-hitters UDAF, which is an Aggregator (not an Expression) and
    * therefore goes through the udf registry rather than injectFunction.
    */
  def register(spark: SparkSession): Unit = {
    val reg = org.apache.spark.sql.GraftColumnBridge.functionRegistry(spark)
    builders.foreach { case (name, b) =>
      reg.registerFunction(FunctionIdentifier(name), info(name), b)
    }
    spark.udf.register("graft_heavy_hitters_32",
      org.apache.spark.sql.functions.udaf(
        new graft.functions.HeavyHitters(32), org.apache.spark.sql.Encoders.scalaLong))
  }
}

/** `spark.sql.extensions`-compatible installer:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        b))
    }
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
    e.injectOptimizerRule(_ => graft.plans.IntervalJoinRule)
    e.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
  }
}
