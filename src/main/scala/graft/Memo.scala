package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for cached intermediate tables. Query builders
  * are re-invoked freely (Bench runs each query 3x, Verify once, specs
  * repeatedly) — a bare `.cache()` inside a builder leaks one fresh
  * copy of the same table per invocation, and the leaked copies
  * compound into session-wide memory pressure. Memoizing the cached
  * DataFrame per (session, key) pins exactly one copy, the same
  * discipline TagIndex and Dedup.clusters already follow.
  */
object Memo {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    m.computeIfAbsent((spark, key), _ => build.cache())

  /** Unpersist + drop every memo held for a session (test hygiene). */
  def clear(spark: SparkSession): Unit = {
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq spark) {
        try e.getValue.unpersist()
        catch { case _: Throwable => () }
        it.remove()
      }
    }
  }
}
