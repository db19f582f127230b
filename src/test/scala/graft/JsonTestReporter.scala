package graft

import org.scalatest.Reporter
import org.scalatest.events._
import java.io.{File, PrintWriter}

/** ScalaTest reporter that writes a driver-visible `TESTS_r{N}.json`
  * (pass/fail/canceled counts + failed test names) at the end of every
  * `sbt test` run. Round-7 retro: the suite shipped RED (232/234) with
  * no artifact recording it — this makes "suite green at snapshot time"
  * a machine-checkable round invariant instead of a claim in NEXT.md.
  *
  * The round number self-syncs to the driver's artifacts: it is
  * 1 + max(N) over the `CORRECTNESS_r{N}.json` files already in the repo
  * root (the driver writes round N's correctness file only AFTER the
  * round ends, so during round N the max on disk is N-1). Override with
  * SPARK_GRAFT_TESTS_OUT for ad-hoc runs.
  *
  * Wired via `Test / testOptions += Tests.Argument(..., "-C", ...)` in
  * build.sbt, so it cannot be forgotten — any full or partial test run
  * refreshes the artifact.
  */
final class JsonTestReporter extends Reporter {
  private var succeeded = 0
  private var canceled = 0
  private var ignored = 0
  private val failed = scala.collection.mutable.ArrayBuffer.empty[String]
  private val aborted = scala.collection.mutable.ArrayBuffer.empty[String]

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c    => c.toString
    } + "\""

  private def roundedOutPath(): String =
    sys.env.get("SPARK_GRAFT_TESTS_OUT").getOrElse {
      val rx = raw"CORRECTNESS_r(\d+)\.json".r
      val prev = Option(new File(".").listFiles()).getOrElse(Array.empty)
        .flatMap(f => f.getName match {
          case rx(n) => Some(n.toInt)
          case _     => None
        })
      val round = if (prev.isEmpty) 1 else prev.max + 1
      f"TESTS_r$round%02d.json"
    }

  override def apply(event: Event): Unit = event match {
    case e: TestSucceeded => succeeded += 1
    case e: TestFailed    => failed += s"${e.suiteName}: ${e.testName}"
    case e: TestCanceled  => canceled += 1
    case e: TestIgnored   => ignored += 1
    // a suite whose constructor/beforeAll throws runs ZERO tests and
    // emits only SuiteAborted — without this, a crashed suite would
    // write green: true (the exact silent-red-ship this artifact exists
    // to prevent)
    case e: SuiteAborted => aborted += e.suiteName
    case e: RunAborted => // no RunCompleted follows an aborted run — write here
      aborted += "RUN ABORTED"
      writeArtifact()
    case _: RunCompleted | _: RunStopped =>
      writeArtifact()
    case _ => ()
  }

  private def writeArtifact(): Unit = {
    val total = succeeded + failed.size + canceled
    val green = failed.isEmpty && aborted.isEmpty
    val path = roundedOutPath()
    // A GREEN run smaller than the one already on disk is EITHER a
    // partial `testOnly` run (the artifact must not silently assert
    // green for tests it never ran) OR a legitimately shrunk suite
    // (tests deleted/renamed — the newer, smaller run is the truth).
    // The reporter cannot tell them apart, so it always writes the
    // latest actual run and marks the ambiguity instead of silently
    // keeping a stale file that claims green for tests that may no
    // longer exist: `maybe_partial: true` + `prev_total` flag the
    // shrink, and `written_at` dates every artifact so a stale record
    // can never masquerade as current.
    val existingTotal =
      try {
        val src = scala.io.Source.fromFile(path)
        val txt =
          try src.mkString
          finally src.close()
        raw""""total":\s*(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toInt)
      } catch { case _: Throwable => None }
    val maybePartial = green && existingTotal.exists(_ > total)
    if (maybePartial) {
      System.err.println(
        s"[JsonTestReporter] run covered $total tests but $path previously recorded ${existingTotal.get} — writing with green: false, maybe_partial: true (full `sbt test` restores green)")
    }
    val writtenAt = java.time.Instant.now().toString
    // `green` is the CONSUMER-FACING verdict: a possibly-partial run must
    // not assert green for tests it never ran, so maybe_partial forces
    // green: false even when every executed test passed (round-9 advice —
    // consumers that read only `green` would otherwise see a green
    // artifact covering a subset of suites). `run_green` preserves the
    // this-run-only outcome for humans debugging a partial run.
    val consumerGreen = green && !maybePartial
    val json =
      s"""{"succeeded": $succeeded, "failed": ${failed.size}, "canceled": $canceled, "ignored": $ignored, "aborted_suites": ${aborted.size}, "total": $total, "green": $consumerGreen, "run_green": $green, "maybe_partial": $maybePartial, "prev_total": ${existingTotal.map(_.toString).getOrElse("null")}, "written_at": ${jsonStr(writtenAt)}, "failed_names": [${(failed ++ aborted.map("ABORTED: " + _)).map(jsonStr).mkString(", ")}]}"""
    val out = new PrintWriter(path)
    try out.println(json)
    finally out.close()
  }
}
