package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query: the Spark implementation plus (when the semantics are
  * ANSI-SQL-expressible) an equivalent DuckDB oracle SQL for the driver's
  * correctness gate. Oracle-less queries get the weaker rows-only check.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Registry {
  /** All query modules, aggregated by SparkEntry. */
  def all: Seq[Q] =
    operators.Relational.all ++
      operators.Sketches.all ++
      operators.Sinks.all ++
      operators.Profile.all ++
      operators.TextAnalysis.all ++
      operators.Dedup.all ++
      operators.Curation.all ++
      operators.Similarity.all ++
      operators.Multimodal.all ++
      streaming.EventsStreaming.all ++
      harmony.HarmonyQueries.all
}
