package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the scale-smoke fixture derivation ([[ScaleFixture]]):
  * replication must keep WITHIN-copy structure isomorphic (so per-row
  * work per operator is unchanged) while collapsing CROSS-copy
  * similarity (so the true near-dup workload scales linearly with the
  * factor instead of quadratically, as naive row duplication would).
  */
class ScaleFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Stride = 100000000L // must match ScaleFixture.Stride

  private val docs = Seq(
    // an identical twin pair (jaccard 1.0 — deterministically caught by
    // LSH at any banding), a partial-overlap pair, and an unrelated doc
    (1L, "alpha beta gamma delta epsilon zeta eta theta", "en", "web", 8L),
    (2L, "alpha beta gamma delta epsilon zeta eta theta", "en", "web", 8L),
    (3L, "alpha beta gamma delta iota kappa lambda mu", "en", "web", 8L),
    (4L, "completely different words in this document here now", "en", "web", 8L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  /** Exact shingle-jaccard of every intra-frame pair (no LSH — the gate
    * must be deterministic at any similarity level).
    */
  private def pairJaccards(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] = {
    val sh = df.select(col("doc_id"), TextFunctions.shingleSet(col("text"), 3).as("sh"))
    sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id"), col("b.doc_id"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh")))).as("j"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
  }

  test("saltedDocuments: N× rows, per-copy jaccard structure isomorphic, zero cross-copy overlap") {
    val tripled = ScaleFixture.saltedDocuments(docs, 3)
    assert(tripled.count() === 12L)
    val j = pairJaccards(tripled)
    val base = pairJaccards(docs)
    for (k <- 0 until 3; (p @ (a, b), v) <- base) {
      val shifted = (a + k * Stride, b + k * Stride)
      assert(j.get(shifted).contains(v),
        s"copy $k pair $p: jaccard ${j.get(shifted)} != original $v — salting broke isomorphism")
    }
    // every cross-copy pair (including a doc vs its own copy) shares NO
    // shingle — the property that keeps the near-dup workload linear
    val crossCopy = j.filter { case ((a, b), _) => a / Stride != b / Stride }
    assert(crossCopy.nonEmpty && crossCopy.values.forall(_ == 0.0),
      s"cross-copy overlap present: ${crossCopy.filter(_._2 > 0).take(3)}")
    // the production emitter sees exactly factor× the original pair count
    val pairs = operators.Dedup.minHashNearDups(tripled, "text", "doc_id", 0.9)
    val emitted = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheUtil.release(pairs)
    assert(emitted === (0 until 3).map(k => (1L + k * Stride, 2L + k * Stride)).toSet)
  }

  test("signFlippedEmbeddings: norms and within-copy cosines bit-for-bit preserved, self-copy decorrelated") {
    // fixture-dimension (64) vectors: sign-flip decorrelation is a
    // sum-of-±x_i² concentration argument — at 8 dims a specific hash
    // pattern left |cos| at 0.94, at 64 dims the spread is ~1/√64
    def mk(seed: Int): Array[Float] =
      Array.tabulate(64)(i => (math.sin(seed * 131.0 + i * 7.3) * 2.0).toFloat)
    val emb = Seq(
      (1L, mk(1), 0),
      (2L, mk(1).zipWithIndex.map { case (x, i) => if (i % 16 == 0) -x else x }, 0),
      (3L, mk(3), 1)
    ).toDF("vec_id", "embedding", "label")
    val tripled = ScaleFixture.signFlippedEmbeddings(emb, 3)
    val byId = tripled.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(byId.size === 9)
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    for (k <- 0 until 3; i <- Seq(1L, 2L, 3L)) {
      // norms exactly preserved: x² is sign-invariant component-wise
      assert(dot(byId(i + k * Stride), byId(i + k * Stride)) === dot(byId(i), byId(i)),
        s"copy $k vec $i: norm changed")
    }
    for (k <- 0 until 3; Seq(a, b) <- Seq(1L, 2L, 3L).combinations(2)) {
      // within-copy dot products exactly preserved: both vectors carry
      // the SAME sign pattern, so flips cancel term-by-term
      assert(dot(byId(a + k * Stride), byId(b + k * Stride)) === dot(byId(a), byId(b)),
        s"copy $k pair ($a,$b): dot product changed")
    }
    // a vector and its own sign-flipped copy must NOT be near-duplicates
    for (i <- Seq(1L, 2L, 3L); k <- 1 until 3) {
      val cos = dot(byId(i), byId(i + k * Stride)) /
        math.sqrt(dot(byId(i), byId(i)) * dot(byId(i + k * Stride), byId(i + k * Stride)))
      assert(math.abs(cos) < 0.6, s"vec $i copy $k still correlated: cos=$cos")
    }
  }

  test("shiftedEvents: N× rows, join pairs + unmatched counts scale exactly linearly, event-time walk unchanged") {
    import java.sql.Timestamp
    def th(hm: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $hm:00")
    // the st14/st16 twin fixture: 2 matched pairs, 2 unmatched errors,
    // 2 unmatched clicks per copy
    val ev = Seq(
      (1L, th("00:00"), 3L, "click"),
      (2L, th("00:10"), 1L, "click"),
      (4L, th("01:00"), 1L, "error"),
      (5L, th("01:10"), 2L, "click"),
      (6L, th("01:15"), 2L, "error"),
      (7L, th("02:00"), 4L, "error"),
      (8L, th("02:10"), 4L, "click"),
      (9L, th("02:30"), 3L, "error")
    ).toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
    val tripled = ScaleFixture.shiftedEvents(ev, 3)
    assert(tripled.count() === 3 * ev.count())
    // the batch full-outer interval join: (matched, unmatched-err,
    // unmatched-click) — the stream-join workload the smoke measures
    def counts(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val l = df.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id").as("u"), col("ts").as("err_ts"))
      val r = df.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("ru"), col("ts").as("click_ts"))
      val j = l.join(r,
        col("u") === col("ru") &&
          col("click_ts") >= col("err_ts") - expr("INTERVAL 1 HOUR") &&
          col("click_ts") <= col("err_ts"),
        "full_outer")
      (j.filter(col("err_id").isNotNull && col("click_id").isNotNull).count(),
        j.filter(col("click_id").isNull).count(),
        j.filter(col("err_id").isNull).count())
    }
    val (m1, ue1, uc1) = counts(ev)
    assert((m1, ue1, uc1) === ((2L, 2L, 2L)), "base fixture drifted")
    assert(counts(tripled) === ((3 * m1, 3 * ue1, 3 * uc1)),
      "cross-copy matches present or a copy lost rows — the join workload is not linear")
    // event times untouched: the watermark walk (micro-batch boundaries,
    // eviction points) is identical at every factor
    assert(
      tripled.select(col("ts")).distinct().collect().map(_.getTimestamp(0)).toSet ===
        ev.select(col("ts")).distinct().collect().map(_.getTimestamp(0)).toSet)
    // ids stay disjoint across copies (the linearity mechanism)
    assert(tripled.select(col("user_id")).distinct().count() === 3 * 4L)
  }
}
