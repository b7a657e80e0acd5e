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

  // ---- fused n-gram / SRP kernels: determinism + semantic invariants ----

  private val wordyStr =
    Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "yy"))
      .map(_.take(30).mkString(" "))

  property("ngram kernels are deterministic and self-Jaccard is 1") =
    forAll(wordyStr, Gen.chooseNum(2, 8)) { (s, n) =>
      val u1 = UTF8String.fromString(s)
      val u2 = UTF8String.fromString(s)
      val sig1 = graft.functions.NgramHash.charMinHash(u1, n, 16)
      val sig2 = graft.functions.NgramHash.charMinHash(u2, n, 16)
      val sameSig = (0 until 16).forall(i => sig1.getLong(i) == sig2.getLong(i))
      sameSig &&
        graft.functions.NgramHash.charJaccard(u1, u2, n) == 1.0 &&
        graft.functions.NgramHash.wordJaccard(u1, u2, n) == 1.0
    }

  property("ngram Jaccard is symmetric and bounded") =
    forAll(wordyStr, wordyStr, Gen.chooseNum(2, 6)) { (a, b, n) =>
      val ua = UTF8String.fromString(a)
      val ub = UTF8String.fromString(b)
      val j = graft.functions.NgramHash.wordJaccard(ua, ub, n)
      j == graft.functions.NgramHash.wordJaccard(ub, ua, n) && j >= 0.0 && j <= 1.0
    }

  // integer-valued doubles: projections sum exactly, so the mathematical
  // scale-invariance is testable without FP sign flips at near-zero sums
  // (real embeddings can flip isolated bits there — banding absorbs it)
  property("SRP signature is deterministic and scale-invariant") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-100, 100))
        .map(_.take(16).map(_.toDouble))) { xs =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val v = new GenericArrayData(xs.toArray[Any])
      val scaled = new GenericArrayData(xs.map(_ * 3.0).toArray[Any])
      val s1 = graft.functions.SrpHash.signature(v, 16, isFloat = false)
      val s2 = graft.functions.SrpHash.signature(v, 16, isFloat = false)
      val s3 = graft.functions.SrpHash.signature(scaled, 16, isFloat = false)
      s1 == s2 && s1 == s3
    }

  property("hilbert xy2d is a bijection with unit steps at any order") =
    forAll(Gen.chooseNum(1, 5)) { order =>
      import graft.functions.HilbertKernel.xy2d
      val side = 1 << order
      val cells = for (x <- 0 until side; y <- 0 until side)
        yield xy2d(order, x, y) -> ((x, y))
      val byD = cells.toMap
      val bijective = byD.size == side * side &&
        byD.keys.min == 0L && byD.keys.max == side.toLong * side - 1
      val unitSteps = (0L until (side.toLong * side - 1)).forall { d =>
        val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
        math.abs(x1 - x2) + math.abs(y1 - y2) == 1
      }
      bijective && unitSteps
    }

  property("mmr rerank: distinct ids, bounded size, λ=1 follows relevance") =
    forAll(Gen.chooseNum(1, 12), Gen.listOfN(12,
      Gen.zip(Gen.chooseNum(0L, 50L), Gen.chooseNum(-100, 100)))) { (k, raw) =>
      import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      // distinct ids; score from the int; a 2-dim vector from the pair
      val cands = raw.map(_._1).distinct.zip(raw).map { case (id, (_, s)) =>
        new GenericInternalRow(Array[Any](id, s.toDouble,
          new GenericArrayData(Array[Any](s.toDouble, 1.0))))
      }
      val arr = new GenericArrayData(cands.toArray[Any])
      val out = graft.functions.MmrKernel.rerank(arr, 1.0, k)
        .toLongArray().toSeq
      val ids = cands.map(_.getLong(0))
      val expectedSize = math.min(k, cands.size)
      val relevanceOrder = cands.map(r => (-r.getDouble(1), r.getLong(0)))
        .sorted.map(_._2).take(expectedSize)
      out.size == expectedSize && out.distinct.size == out.size &&
        out == relevanceOrder
    }
}
