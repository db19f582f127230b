package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered query runs and returns rows at sf0.001, and
  * every oracle key points at a registered query (driver-contract
  * invariants).
  */
class EntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys; names unique") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
    assert(SparkEntry.queryDefs.map(_.name).distinct.size === SparkEntry.queryDefs.size)
  }

  /** Legitimately empty at sf0.001: every customer has orders (anti-join),
    * and the near-dup thresholds exceed the tiny slice's max similarity.
    */
  private val mayBeEmpty =
    Set("q11_join_anti", "d02_minhash_neardup", "d03_simhash_neardup",
      "d08_incremental_dedup", "d09_incremental_simhash", "st01_stream_simhash")

  for (q <- SparkEntry.queryDefs)
    test(s"${q.name} runs at sf0.001 with rows") {
      val n = q.fn(spark, SparkTestSession.sfDir).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
}
