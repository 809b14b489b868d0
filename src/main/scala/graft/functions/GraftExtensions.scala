package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions

/** One-call registration of every graft custom SQL function on a live
  * session (local tools, tests, notebooks). */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    graft.kmer.KmerGenerator.register(spark)
    DotProduct.register(spark)
    ZValue.register(spark)
    HllRegisterAgg.register(spark)
  }
}

/** `SparkSessionExtensions` hook — the deployment integration point: a
  * cluster sets `spark.sql.extensions=graft.functions.GraftExtensions`
  * and every session (including Thrift/Connect-served ones that never
  * run library code) gets the native functions at build time, instead of
  * each application calling registerAll. Injection happens before any
  * query is parsed, so plain SQL like
  * `SELECT dot_product(a, b)` / `SELECT kmer_explode(seq, 8)` resolves
  * with no Scala entry point involved.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "usage: dot_product(x, y)")
        DotProduct(exprs.head, exprs(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("kmer_explode"),
      new ExpressionInfo(classOf[graft.kmer.KmerGenerator].getName, "kmer_explode"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "usage: kmer_explode(seq, k)")
        val k = exprs(1) match {
          case Literal(v: Int, _) => v
          case e if e.foldable => e.eval().toString.toInt
          case _ => throw new IllegalArgumentException(
            "kmer_explode: k must be an integer literal")
        }
        graft.kmer.KmerGenerator(exprs.head, k)
      }))

    ext.injectFunction((
      FunctionIdentifier("z_value"),
      new ExpressionInfo(classOf[ZValue].getName, "z_value"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "usage: z_value(x, y)")
        ZValue(exprs.head, exprs(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("hll_registers"),
      new ExpressionInfo(classOf[HllRegisterAgg].getName, "hll_registers"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "usage: hll_registers(x)")
        HllRegisterAgg(exprs.head).toAggregateExpression()
      }))

    // band-join → binned equi-join rewrite (see plans.RangeBinJoin)
    ext.injectOptimizerRule(_ => graft.plans.RangeBinJoin)

    // native as-of join planning (see plans.AsOfJoinPlan)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
