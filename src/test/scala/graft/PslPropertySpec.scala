package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Property-based hardening of the PSL matcher (plain JVM calls — no
  * Spark session needed): the example-based t16 gate pins the planted
  * branches; these properties pin the ALGEBRA over randomized hosts
  * built from the vendored rule set plus arbitrary labels, so a future
  * snapshot swap or matcher edit cannot silently break the invariants
  * `capPerGroup(domain)` relies on (stable, idempotent, suffix-shaped
  * grouping keys).
  */
class PslPropertySpec extends AnyFunSuite {

  /** Raw-scalacheck bridge (no scalatestplus in the offline cache):
    * run the prop and fail the ScalaTest test with the counterexample.
    */
  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private def rd(host: String): Option[String] =
    Option(graft.functions.DomainFunctionImpls.registrable(UTF8String.fromString(host)))
      .map(_.toString)
  private def ps(host: String): Option[String] =
    Option(graft.functions.DomainFunctionImpls.publicSuffix(UTF8String.fromString(host)))
      .map(_.toString)

  private val label: Gen[String] =
    for {
      n <- Gen.choose(1, 8)
      cs <- Gen.listOfN(n, Gen.alphaNumChar)
    } yield cs.mkString.toLowerCase

  // suffixes drawn from the vendored snapshot (exact rules) plus
  // unknown TLDs (implicit-* territory). DELIBERATELY no wildcard-rule
  // suffixes (e.g. kawasaki.jp under `*.jp`-style rules): for a host
  // directly under a `*.` rule, prefixing one label flips the
  // registrable domain from Some to None (x.kawasaki.jp IS the public
  // suffix), so the prefix-stability property below is only universal
  // over non-wildcard suffixes — extending this generator with
  // wildcard rules requires special-casing that property, not a
  // matcher fix (round-10 advice).
  private val suffix: Gen[String] = Gen.frequency(
    4 -> Gen.oneOf("com", "co.uk", "github.io", "co.jp", "com.au", "ac.uk"),
    1 -> Gen.oneOf("unknowntld", "zz", "internal")
  )

  private val host: Gen[String] =
    for {
      depth <- Gen.choose(0, 3)
      labels <- Gen.listOfN(depth, label)
      s <- suffix
    } yield (labels :+ s).mkString(".")

  test("registrable domain is a dot-suffix of the host and extends the public suffix by one label") {
    check(forAll(host) { h =>
      (rd(h), ps(h)) match {
        case (Some(r), Some(p)) =>
          Prop.all(
            Prop(h == r || h.endsWith("." + r)) :| s"registrable '$r' not a suffix of '$h'",
            Prop(r.endsWith("." + p)) :| s"registrable '$r' does not extend suffix '$p'",
            Prop(r.substring(0, r.length - p.length - 1).nonEmpty &&
              !r.substring(0, r.length - p.length - 1).contains(".")) :|
              s"registrable '$r' is not suffix+ONE label (suffix '$p')"
          )
        case (None, _) => Prop.passed // bare suffix / non-hostname
        case (Some(r), None) => Prop.falsified :| s"registrable '$r' without a public suffix"
      }
    })
  }

  test("registrable domain is idempotent and case/trailing-dot stable") {
    check(forAll(host) { h =>
      val r1 = rd(h)
      Prop.all(
        Prop(r1.forall(r => rd(r).contains(r))) :| s"not idempotent on $h -> $r1",
        Prop(rd(h.toUpperCase) == r1) :| s"case-unstable on $h",
        Prop(rd(h + ".") == r1) :| s"trailing-dot-unstable on $h"
      )
    })
  }

  test("every host of one registrable domain maps to the same capPerGroup key") {
    // the property capPerGroup(domain) depends on: prefixing labels
    // never changes the registrable domain (as long as one exists)
    check(forAll(host, label) { (h, extra) =>
      rd(h) match {
        case Some(r) => Prop(rd(s"$extra.$h").contains(r)) :|
          s"prefixing '$extra.' changed domain of $h from $r to ${rd(s"$extra.$h")}"
        case None => Prop.passed
      }
    })
  }

  test("punycode twin: the A-label host resolves to the A-label of the U-label host's domain") {
    // the loader indexes every U-label rule under its punycode A-label
    // form, so the two spellings of one host must resolve to the two
    // spellings of ONE registrable domain (round-10 verdict #2). Bare
    // suffixes map None -> None through the same equation.
    val idnSuffix: Gen[String] = Gen.oneOf("公司.cn", "рф", "срб", "укр", "бг")
    val idnHost: Gen[String] =
      for {
        depth <- Gen.choose(0, 3)
        labels <- Gen.listOfN(depth, label)
        s <- idnSuffix
      } yield (labels :+ s).mkString(".")
    check(forAll(idnHost) { h =>
      val a = java.net.IDN.toASCII(h)
      Prop(rd(a) == rd(h).map(java.net.IDN.toASCII)) :|
        s"A-label '$a' -> ${rd(a)} but U-label '$h' -> ${rd(h)}"
    })
  }

  test("IP literals and junk never yield a domain") {
    check(forAll(Gen.choose(0, 255), Gen.choose(0, 255)) { (a, b) =>
      Prop(rd(s"$a.$b.0.1").isEmpty)
    })
    assert(rd("") === None)
    assert(rd("a..b.com") === None)
    assert(rd("[::1]") === None)
  }
}
