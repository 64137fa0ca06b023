package graft

import graft.fakegen.FakeGen

import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level properties, mirroring the reference's per-transformator
  * unit tests (SURVEY.md §5.1) plus ScalaCheck determinism properties. */
class FakeGenSpec extends AnyFunSuite {

  val seed = 42L

  test("determinism: same value + seed => identical output, every kind") {
    val prop = forAll(Gen.asciiPrintableStr) { v =>
      FakeGen.email(v, seed) == FakeGen.email(v, seed) &&
      FakeGen.fullName(v, seed) == FakeGen.fullName(v, seed) &&
      FakeGen.phone(v, seed) == FakeGen.phone(v, seed) &&
      FakeGen.uuid(v, seed) == FakeGen.uuid(v, seed)
    }
    assert(check(Parameters.default, prop).passed)
  }

  test("seed sensitivity: different global seed => (almost surely) different output") {
    val vals = (1 to 100).map(i => s"user$i@corp.com")
    val same = vals.count(v => FakeGen.email(v, 42L) == FakeGen.email(v, 43L))
    assert(same < 5, s"$same/100 collisions across seeds")
  }

  test("value sensitivity: distinct inputs spread over the wordlist space") {
    val outs = (1 to 500).map(i => FakeGen.email(s"u$i", seed)).toSet
    assert(outs.size > 300, s"only ${outs.size} distinct fakes for 500 inputs")
  }

  test("email shape: local@rfc2606-domain, differs from original") {
    val e = FakeGen.email("john.doe@corp.com", seed)
    assert(e.matches("""[a-z]+\.[a-z]+\d{0,2}@example\.(com|org|net)"""), e)
    assert(e != "john.doe@corp.com")
  }

  test("phone: formatting preserved, every digit differs, len<=1 unchanged") {
    val orig = "+44 20 7123 4567"
    val out = FakeGen.phone(orig, seed)
    assert(out.length == orig.length)
    assert(out != orig)
    orig.zip(out).foreach { case (o, n) =>
      if (o.isDigit) { assert(n.isDigit); assert(n != o, s"digit kept at $o") }
      else assert(n == o, s"formatting char $o changed to $n")
    }
    assert(FakeGen.phone("7", seed) == "7")
    assert(FakeGen.phone("", seed) == "")
  }

  test("multi-email: brace wrap + element count preserved, each a fake email") {
    val out = FakeGen.multiEmail("{foo@a.com, bar@b.com, qux@c.com}", seed)
    assert(out.startsWith("{") && out.endsWith("}"), out)
    val parts = out.substring(1, out.length - 1).split(",")
    assert(parts.length == 3)
    parts.foreach(p => assert(p.contains("@example."), p))
    // element-seeded: same address fakes identically in scalar + multi
    assert(parts(0) == FakeGen.email("foo@a.com", seed))
    assert(FakeGen.multiEmail("x", seed) == "x")
  }

  test("uuid: canonical v4 shape, deterministic") {
    val u = FakeGen.uuid("anything", seed)
    assert(u.matches("""[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}"""), u)
  }

  test("address: 5 space-joined parts with numeric zip/postcode") {
    val a = FakeGen.address("42 real st", seed)
    assert(a.matches("""\d+ .+ \d{5} .+ \d{5}"""), a)
  }

  test("full name = first + last composed deterministically") {
    val n = FakeGen.fullName("Jane Roe", seed)
    assert(n == FakeGen.firstName("Jane Roe", seed) + " " + FakeGen.lastName("Jane Roe", seed))
  }
}
