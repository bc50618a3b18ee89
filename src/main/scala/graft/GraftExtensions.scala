package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

import graft.functions.{DecDotProduct, DecQuant, HyperplaneBuckets, KmAssign, M61UHash, MinHash128, PolyShingle3, ShingleHash3, SimHash64}

/** Engine extension point: registers graft's native Catalyst
  * expressions with the session's function registry, so they're
  * usable from both the Column API (`expr("simhash64(t)")`) and
  * plain SQL. Wire via `SparkSession.builder.withExtensions` (Engine
  * does) or `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def unary(name: String)(mk: Expression => Expression)
      : Seq[Expression] => Expression = { children =>
    if (children.size != 1) throw new IllegalArgumentException(
      s"$name expects exactly 1 argument, got ${children.size}")
    mk(children.head)
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      unary("simhash64")(SimHash64.apply)))
    ext.injectFunction((
      FunctionIdentifier("minhash128"),
      new ExpressionInfo(classOf[MinHash128].getName, "minhash128"),
      unary("minhash128")(MinHash128.apply)))
    ext.injectFunction((
      FunctionIdentifier("shingle_hash3"),
      new ExpressionInfo(classOf[ShingleHash3].getName, "shingle_hash3"),
      unary("shingle_hash3")(ShingleHash3.apply)))
    ext.injectFunction((
      FunctionIdentifier("shingle_poly3"),
      new ExpressionInfo(classOf[PolyShingle3].getName, "shingle_poly3"),
      unary("shingle_poly3")(PolyShingle3.apply)))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "hyperplane_buckets"),
      { children =>
        children match {
          case Seq(c) => HyperplaneBuckets(c)
          case Seq(c, p) if p.foldable =>
            HyperplaneBuckets(c, p.eval() match {
              case i: Int => i
              case l: Long => l.toInt
              case other => throw new IllegalArgumentException(
                s"hyperplane_buckets planes must be an integer literal, got $other")
            })
          case _ => throw new IllegalArgumentException(
            "hyperplane_buckets expects (array<float>) or " +
              "(array<float>, planes literal)")
        }
      }))
    ext.injectFunction((
      FunctionIdentifier("dec_quant"),
      new ExpressionInfo(classOf[DecQuant].getName, "dec_quant"),
      unary("dec_quant")(DecQuant.apply)))
    ext.injectFunction((
      FunctionIdentifier("dec_dot"),
      new ExpressionInfo(classOf[DecDotProduct].getName, "dec_dot"),
      { children =>
        if (children.size != 2) throw new IllegalArgumentException(
          s"dec_dot expects exactly 2 arguments, got ${children.size}")
        DecDotProduct(children.head, children(1))
      }))
    // Spark ships codegen'd Bloom expressions for its own runtime row
    // filters (InjectRuntimeFilter) but leaves them OFF the public
    // function registry — surface them, so the Bloom decontamination
    // prefilter probes inside whole-stage codegen instead of through
    // a scala UDF over a broadcast sketch object.
    ext.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      { children =>
        children match {
          case Seq(c) => new BloomFilterAggregate(c)
          case Seq(c, n) => new BloomFilterAggregate(c, n)
          case Seq(c, n, m) => new BloomFilterAggregate(c, n, m)
          case _ => throw new IllegalArgumentException(
            "bloom_filter_agg expects (col[, estimatedItems[, numBits]])")
        }
      }))
    ext.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName,
        "might_contain"),
      { children =>
        if (children.size != 2) throw new IllegalArgumentException(
          s"might_contain expects exactly 2 arguments, got ${children.size}")
        BloomFilterMightContain(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("m61_uhash"),
      new ExpressionInfo(classOf[M61UHash].getName, "m61_uhash"),
      { children =>
        if (children.size != 3) throw new IllegalArgumentException(
          s"m61_uhash expects exactly 3 arguments, got ${children.size}")
        M61UHash(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("km_assign"),
      new ExpressionInfo(classOf[KmAssign].getName, "km_assign"),
      { children =>
        if (children.size != 2) throw new IllegalArgumentException(
          s"km_assign expects exactly 2 arguments, got ${children.size}")
        KmAssign(children.head, children(1))
      }))
  }
}
