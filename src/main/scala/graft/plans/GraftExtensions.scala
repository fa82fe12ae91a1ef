package graft.plans

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Session-extension entry point (enable with
  * `spark.sql.extensions=graft.plans.GraftExtensions`): registers the
  * engine's native expressions into the function registry so they are
  * callable from both the Column API (`call_function("graft_dot", …)`)
  * and SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) {
          throw new AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_dot`",
              "expectedNum" -> "2",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        }
        // accept array<float>/array<int> inputs by upcasting here (the
        // expression itself requires array<double>)
        def asDouble(e: Expression): Expression = e.dataType match {
          case ArrayType(DoubleType, _) => e
          case _ => Cast(e, ArrayType(DoubleType))
        }
        DotProduct(asDouble(exprs.head), asDouble(exprs(1)))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("graft_kgrams"),
      new ExpressionInfo(classOf[KgramHashes].getName, "graft_kgrams"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) {
          throw new AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_kgrams`",
              "expectedNum" -> "2",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        }
        KgramHashes(exprs.head, exprs(1))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimhashDet].getName, "graft_simhash"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1) {
          throw new AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_simhash`",
              "expectedNum" -> "1",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        }
        SimhashDet(exprs.head)
      }))
    extensions.injectFunction((
      new FunctionIdentifier("graft_sign_key"),
      new ExpressionInfo(classOf[SignBucketKey].getName, "graft_sign_key"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 3 && exprs.length != 4) {
          throw new AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_sign_key`",
              "expectedNum" -> "3",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        }
        // plane matrix, width and widen pairs are structural parameters,
        // not per-row data — they must fold at analysis time
        // (lit(Array[Double]), lit(Int), lit(Array[Int]))
        require(exprs.drop(1).forall(_.foldable),
          "graft_sign_key planes/bits/widenPairs must be literals")
        val planes = exprs(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
        val bits = exprs(2).eval() match {
          case i: java.lang.Integer => i.intValue()
          case l: java.lang.Long => l.toInt
          case other => throw new IllegalArgumentException(s"bits literal: $other")
        }
        val pairs = exprs.lift(3).map(_.eval()
            .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray())
          .getOrElse(Array.empty[Int])
        def asDouble(e: Expression): Expression = e.dataType match {
          case ArrayType(DoubleType, _) => e
          case _ => Cast(e, ArrayType(DoubleType))
        }
        SignBucketKey(asDouble(exprs.head), planes, bits, pairs)
      }))
    extensions.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[Simhash64].getName, "graft_simhash64"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1) {
          throw new AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_simhash64`",
              "expectedNum" -> "1",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        }
        Simhash64(exprs.head)
      }))
  }
}
