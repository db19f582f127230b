package graft

import graft.operators.AsofJoin
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

final case class Tick(id: Long, k: Long, ts: Timestamp)

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")

  test("asofJoin matches most recent at-or-before per key; no prior → null") {
    val left = Seq(
      Tick(1, 100, t(10)), // after r2 → matches r2
      Tick(2, 100, t(5)),  // == r1 ts → inclusive match r1
      Tick(3, 100, t(1)),  // before all → null
      Tick(4, 200, t(30))  // other key, no right rows → null
    ).toDS.toDF
    val right = Seq(
      Tick(101, 100, t(5)), // r1
      Tick(102, 100, t(8))  // r2
    ).toDS.toDF
    val got = AsofJoin
      .asofJoin(left, right, "k", "ts", "ts", Map("id" -> "matched"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    assert(got(1L) === 102L)
    assert(got(2L) === 101L)
    assert(got(3L) === -1L)
    assert(got(4L) === -1L)
  }
}
