package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.{CountInSet, DotProduct, MinGramMd5}

/** Session extension wiring: exposes graft's native Catalyst expressions
  * as SQL functions, so `spark.sql("SELECT graft_dot(a, b)")` works
  * anywhere the library is on the classpath — the standard deployment
  * shape for an engine extension (enable with
  * `spark.sql.extensions=graft.GraftExtensions`, or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`).
  *
  * Both functions remain full codegen participants when invoked from SQL:
  * injection registers the expression builder, not a UDF wrapper, so the
  * generated plan is identical to the DataFrame-API path
  * ([[graft.functions.VectorFunctions.dot]] /
  * [[graft.functions.TextFunctions.winnowFingerprint]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Accelerate the naive HOF dot-product spelling to the native
    // expression (see DotProductRewrite's contract notes).
    ext.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot(arrayA, arrayB)")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_min_gram_md5"),
      new ExpressionInfo(classOf[MinGramMd5].getName, "graft_min_gram_md5"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_min_gram_md5(text, gram)")
        val gram = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"gram must be an integer literal, got $other")
        }
        MinGramMd5(children.head, gram)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_count_in_set"),
      new ExpressionInfo(classOf[CountInSet].getName, "graft_count_in_set"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_count_in_set(tokens, array('a','b',...))")
        // The probe set must be a compile-time constant (it becomes the
        // expression's prebuilt hash set), so the second argument has to
        // fold — array literals and foldable expressions over them do.
        val itemsExpr = children(1)
        require(itemsExpr.foldable &&
          itemsExpr.dataType.isInstanceOf[ArrayType] &&
          itemsExpr.dataType.asInstanceOf[ArrayType].elementType == StringType,
          s"items must be a foldable array<string>, got $itemsExpr")
        val items = itemsExpr.eval() match {
          case null => Seq.empty[String]
          case ad: ArrayData =>
            ad.toArray[UTF8String](StringType).filter(_ != null).map(_.toString).toSeq
        }
        CountInSet(children.head, items)
      }))
    // Spark ships codegen'd Bloom-filter expressions (the machinery behind
    // runtime-filter join pruning) but does not register them as SQL
    // functions; these two make the build/probe pair callable so the
    // decontamination pre-filter ([[graft.operators.TextDedup
    // .contaminatedIdsBloom]]) — and any SQL user — can use the engine's
    // own sketch instead of a UDF. The aggregate builder returns the
    // AggregateFunction; the analyzer wraps it in an AggregateExpression.
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => new BloomFilterAggregate(c)
        case Seq(c, est) => new BloomFilterAggregate(c, est)
        case Seq(c, est, bits) => new BloomFilterAggregate(c, est, bits)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg(xxhash64(x)[, estimatedItems[, numBits]])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_might_contain(bloomBinary, xxhash64(x))")
        BloomFilterMightContain(children.head, children(1))
      }))
  }
}
