package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration for the engine's custom expressions, so
  * `spark.sql` users get them by name:
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT simhash64(transform(split(text,' '), t -> xxhash64(t))) FROM docs")
  * }}}
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "dot_f", exprs => DotProductF(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction(
      "l2_norm_f", exprs => L2NormF(exprs.head), "scala_udf")
  }
}
