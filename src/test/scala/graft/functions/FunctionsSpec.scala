package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def eval1(in: Seq[String], f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Any] =
    in.toDF("v").select(f(col("v")).as("r")).collect().map(_.get(0)).toSeq

  test("uuid5 matches Python uuid.uuid5(NAMESPACE_OID, name) bit-exactly") {
    // goldens computed with CPython 3.11 uuid module
    val golden = Seq(
      "HB 102_ocd-division/country:us/state:pa" -> "283445c3-4955-5954-bd32-090e32e48040",
      "SB 1_ocd-division/country:us/state:tx/cd:3" -> "3053910e-3121-5a7d-8bf3-089aae5c59f8",
      "" -> "0a68eb57-c88a-5f34-9e9d-27f85e68af4f",
      "unicode-é-名前" -> "c7a7378c-d3f3-52ae-bdf8-e8dae79df064",
      "vote:119:HR-22" -> "1407bcea-59f6-535b-b106-71eaad06917d")
    val got = eval1(golden.map(_._1), graft.functions.uuid5)
    assert(got == golden.map(_._2))
  }

  test("unaccent strips combining marks only (NFD + Mn removal)") {
    // goldens computed with CPython unicodedata; note ø survives (not Mn)
    val golden = Seq(
      "Núñez García" -> "Nunez Garcia",
      "Søren Kierkegård" -> "Søren Kierkegard",
      "Crème brûlée" -> "Creme brulee",
      "plain ascii" -> "plain ascii",
      "Tōkyō 東京" -> "Tokyo 東京")
    val got = eval1(golden.map(_._1), graft.functions.unaccent)
    assert(got == golden.map(_._2))
  }

  test("fuzzRatio matches difflib.SequenceMatcher ratio on name pairs") {
    val pairs = Seq(
      ("Baldwin", "Baldwin", 100),
      ("Tammy Baldwin", "Baldwin", 70),
      ("Jon Tester", "John Tester", 95),
      ("Smith", "Jones", 0),
      ("A. Mitchell", "Mitchell A.", 73))
    val got = pairs.map(p => FuzzRatio.ratio(
      org.apache.spark.unsafe.types.UTF8String.fromString(p._1),
      org.apache.spark.unsafe.types.UTF8String.fromString(p._2)))
    assert(got == pairs.map(_._3))
  }

  test("wRatio matches the published WRatio algorithm (goldens via stdlib CPython)") {
    // goldens computed with a CPython 3.11 stdlib re-implementation of
    // fuzzywuzzy/thefuzz WRatio (full_process, 1.5/8 length-ratio branches,
    // 0.95/0.9/0.6 scaling, token sort+set, sliding-window partial_ratio)
    val golden = Seq(
      // standardized voter names vs person names — the reference's actual
      // pairs (vote_matching.py standardize → extractOne): all clear 80
      // on the partial branch, where the old max(ratio, token_sort) gave 70
      ("Baldwin", "Tammy Baldwin", 90),
      ("Barrasso", "John Barrasso", 90),
      ("Bennet", "Michael F. Bennet", 90),
      ("Smith", "Smith-Jones (D-CA)", 90),
      // similar-length branch (no partial, 0.95-scaled token ratios)
      ("Baldwin (D-WI)", "Tammy Baldwin", 70),
      ("Barrasso (R-WY)", "John Barrasso", 72),
      ("Bennet (D-CO)", "Michael F. Bennet", 67),
      ("Tammy Baldwin", "Tammy Baldwin", 100),
      ("Baldwn (D-WI)", "Tammy Baldwin", 55),
      ("Zzyzx Qwerty", "Tammy Baldwin", 24),
      ("Cruz (R-TX)", "Ted Cruz", 67),
      ("Ocasio-Cortez (D-NY)", "Alexandria Ocasio-Cortez", 80),
      // >8× length gap: partial scale drops to 0.6
      ("Lee", "A ridiculously long committee description mentioning Lee once", 60))
    val got = golden.map { case (a, b, _) =>
      Seq((a, b)).toDF("a", "b")
        .select(graft.functions.wRatio(col("a"), col("b"))).head.getInt(0)
    }
    assert(got == golden.map(_._3), s"got $got")
  }

  test("partialRatio finds the best window") {
    val df = Seq(("baldwin", "tammy baldwin"), ("xyz", "abcdef")).toDF("a", "b")
    val got = df.select(graft.functions.partialRatio(col("a"), col("b")))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(100, 0))
  }

  test("tokenSortRatio is order-insensitive") {
    val df = Seq(("Dove Kamlager", "Kamlager Dove")).toDF("a", "b")
    val r = df.select(graft.functions.tokenSortRatio(col("a"), col("b"))).head.getInt(0)
    assert(r == 100)
  }

  test("htmlStrip: tags out, entities decoded once, whitespace collapsed") {
    val golden = Seq(
      "<p>Hello <b>world</b></p>" -> "Hello world",
      "a &amp;&amp; b &lt;= c" -> "a && b <= c",
      "&amp;amp; stays one level" -> "&amp; stays one level",
      "no  markup   here" -> "no markup here",
      "<a href=\"x\">&quot;q&quot;</a> &#39;s" -> "\"q\" 's")
    val got = eval1(golden.map(_._1), graft.functions.htmlStrip)
    assert(got == golden.map(_._2), s"got $got")
  }

  test("piiScrub: emails, SSNs, phones redacted; near-misses kept") {
    val golden = Seq(
      "mail me at jo.doe+x@sub.example.org today" -> "mail me at [EMAIL] today",
      "ssn 123-45-6789 phone 555-867-5309" -> "ssn [SSN] phone [PHONE]",
      "order 12-345-6789 is not a phone" -> "order 12-345-6789 is not a phone",
      "no pii here" -> "no pii here")
    val got = eval1(golden.map(_._1), graft.functions.piiScrub)
    assert(got == golden.map(_._2), s"got $got")
  }

  test("reference string helpers") {
    assert(eval1(Seq("119th Congress"), graft.functions.digitsOnly) == Seq("119"))
    assert(eval1(Seq("ocd-division/country:us/state:wi"), graft.functions.stateFromAreaId) == Seq("WI"))
    assert(eval1(Seq("ocd-division/country:us/district:dc/ward:3"), graft.functions.stateFromAreaId) == Seq("DC"))
    assert(eval1(Seq("Baldwin (D-WI)"), graft.functions.stateFromName) == Seq("WI"))
    assert(eval1(Seq("Jeffrey (TX)"), graft.functions.stateFromName) == Seq("TX"))
    assert(eval1(Seq("Kamlager-Dove"), graft.functions.stateFromName) == Seq(""))
    assert(eval1(Seq("Baldwin (D-WI)"), graft.functions.standardizeName) == Seq("Baldwin"))
    assert(eval1(Seq("ocd-jurisdiction/country:us/government"), graft.functions.convertAreaId)
      == Seq("ocd-division/country:us"))
  }

  test("districtNumber: at-large states, zero-strip, alpha districts") {
    val df = Seq(("PA", "01"), ("AK", "07"), ("TX", "00"), ("ME", "0A")).toDF("st", "d")
    val got = df.select(graft.functions.districtNumber(col("st"), col("d"))).collect().map(_.getString(0)).toSeq
    assert(got == Seq("1", "at-large", "", "A"))
  }

  test("simhash: near-duplicate texts land at small hamming distance") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "the quick brown fox jumps over the lazy cat again and again today"
    val c = "completely different content about spark query engines and shuffles"
    val Seq(ha, hb, hc) = Seq(a, b, c).map(s =>
      SimHash.simhash64(org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(ha, hb) < 12, s"near-dup hamming ${ham(ha, hb)}")
    assert(ham(ha, hc) > 12, s"far hamming ${ham(ha, hc)}")
  }

  test("langId picks the marker-dominant language deterministically") {
    val df = Seq(
      "the cat sat on the mat and it is happy",
      "el gato y la casa de los perros con un amigo",
      "der hund und die katze ist von den bergen mit einem freund",
      "xyzzy plugh qwerty").toDF("text")
    val got = df.select(graft.functions.langId(col("text"))).collect().map(_.getString(0)).toSeq
    assert(got == Seq("en", "es", "de", "und"))
  }

  test("vector math: cosine of identical vectors is 1") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f)),
      (Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f))).toDF("a", "b")
    val got = df.select(graft.functions.cosineSimilarity(col("a"), col("b"))).collect().map(_.getDouble(0)).toSeq
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
  }

  test("minhash signature + band keys are deterministic and length-correct") {
    val df = Seq("a b c d e f g h i j").toDF("text")
    val sig = df.select(graft.functions.minHashSignature(
      graft.functions.wordShingles(col("text"), 3), 16).as("sig"))
    val row = sig.head.getSeq[Long](0)
    assert(row.length == 16)
    val row2 = sig.head.getSeq[Long](0)
    assert(row == row2)
  }

  test("merge semantics: incoming wins, created_at preserved") {
    import graft.warehouse.Warehouse
    val existing = Seq((1L, "old", "2020-01-01"), (2L, "keep", "2020-02-02"))
      .toDF("id", "v", "created_at")
    val incoming = Seq((1L, "new", "2026-01-01"), (3L, "ins", "2026-01-01"))
      .toDF("id", "v", "created_at")
    val out = Warehouse.mergeByKey(existing, incoming, Seq("id"), preserve = Seq("created_at"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(out == Seq((1L, "new", "2020-01-01"), (2L, "keep", "2020-02-02"), (3L, "ins", "2026-01-01")))
  }
}
