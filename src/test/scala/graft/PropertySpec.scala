package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{FuzzRatio, SimHash, TopKBuffer, Uuid5}

/** Property-based invariants for the pure kernels (SURVEY §5.2). Runs
  * under sbt's native ScalaCheck framework — no Spark session needed. */
object PropertySpec extends Properties("graft") {

  private val asciiStr = Gen.asciiPrintableStr.map(_.take(50))

  property("uuid5 is deterministic and RFC-4122 v5 shaped") =
    forAll(asciiStr) { s =>
      val u = UTF8String.fromString(s)
      val a = Uuid5.uuid5(u).toString
      val b = Uuid5.uuid5(u).toString
      a == b && a.length == 36 && a(14) == '5' && "89ab".contains(a(19))
    }

  property("fuzzRatio is symmetric, bounded, and 100 iff equal") =
    forAll(asciiStr, asciiStr) { (a, b) =>
      val ua = UTF8String.fromString(a)
      val ub = UTF8String.fromString(b)
      val r = FuzzRatio.ratio(ua, ub)
      val sym = r == FuzzRatio.ratio(ub, ua)
      val bounded = r >= 0 && r <= 100
      val eq100 = if (a == b) r == 100
        else if (a.length == b.length) r < 100 || a == b
        else true // round() can reach 100 only when 2*LCS == |a|+|b| => equal
      sym && bounded && eq100
    }

  property("simhash of identical strings is identical; of disjoint-token strings differs") =
    forAll(Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(30))) { s =>
      val h1 = SimHash.simhash64(UTF8String.fromString(s))
      val h2 = SimHash.simhash64(UTF8String.fromString(s))
      h1 == h2
    }

  private val scoredGen = Gen.listOf(Gen.zip(Gen.chooseNum(-1e6, 1e6), Gen.chooseNum(0L, 1000L)))

  property("TopKBuffer equals sort-then-take(k) with the same tie-break") =
    forAll(scoredGen, Gen.chooseNum(1, 8)) { (xs, k) =>
      val buf = new TopKBuffer(k)
      xs.foreach { case (s, id) => buf.add(s, id) }
      val expect = xs.map { case (s, id) => (id, s) }
        .sortBy { case (id, s) => (-s, id) }.distinct // stable order; duplicates allowed
      val got = buf.sorted.toSeq
      val want = xs.map { case (s, id) => (id, s) }.sortBy { case (id, s) => (-s, id) }.take(k)
      got == want
    }

  property("TopKBuffer merge equals union top-k") =
    forAll(scoredGen, scoredGen, Gen.chooseNum(1, 5)) { (xs, ys, k) =>
      val a = new TopKBuffer(k)
      xs.foreach { case (s, id) => a.add(s, id) }
      val b = new TopKBuffer(k)
      ys.foreach { case (s, id) => b.add(s, id) }
      var i = 0
      while (i < b.size) { a.add(b.scores(i), b.ids(i)); i += 1 }
      val want = (xs ++ ys).map { case (s, id) => (id, s) }
        .sortBy { case (id, s) => (-s, id) }.take(k)
      a.sorted.toSeq == want
    }
}
