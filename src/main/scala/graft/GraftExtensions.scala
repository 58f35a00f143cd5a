package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftglue.FunctionGlue

import graft.expressions.VectorExpressions._

/** SQL surface for the vector kernels: `vec_dot`, `vec_cosine`,
  * `vec_l2_normalize`, `vec_euclidean_distance` become callable from
  * `spark.sql(...)`, so SQL-only users get the same codegen kernels the
  * DataFrame API uses.
  *
  * Two registration paths:
  *  - [[GraftExtensions]] for session startup:
  *    `spark.sql.extensions=graft.GraftExtensions` or
  *    `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *  - [[GraftFunctions.register]] for an already-running session.
  */
object GraftFunctions {

  /** (name, arity, builder) for every SQL-exposed kernel. */
  val all: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("vec_dot", 2, es => VecDot(es(0), es(1))),
    ("vec_cosine", 2, es => VecCosine(es(0), es(1))),
    ("vec_l2_normalize", 1, es => VecL2Normalize(es(0))),
    ("vec_euclidean_distance", 2, es => VecEuclideanDistance(es(0), es(1))))

  private def checkedBuilder(
      name: String, arity: Int,
      builder: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      require(es.length == arity,
        s"$name expects $arity argument(s), got ${es.length}")
      builder(es)
    }

  /** Register the kernels as temp functions on a live session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, arity, builder) =>
      FunctionGlue.registerTemp(spark, name, checkedBuilder(name, arity, builder))
    }
}

/** `spark.sql.extensions` entry point injecting the vector kernels. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, arity, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[VecDot].getName, name),
        es => {
          require(es.length == arity,
            s"$name expects $arity argument(s), got ${es.length}")
          builder(es)
        }))
    }
}
