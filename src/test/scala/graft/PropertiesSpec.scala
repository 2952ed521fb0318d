package graft

import java.time.LocalDate

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.WeekBins
import graft.functions.{Base26, MinHash, NgramHashes, PortableMinHash, SortedJaccard}
import graft.tiling.TileKernel

/** Property suites (SURVEY.md §5.2) over the pure kernels — scalacheck
  * drives the generators; Spark-level behavior of the same operators is
  * covered by the golden/oracle specs.
  */
class PropertiesSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 100): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  // -- letters ---------------------------------------------------------

  private def lettersToLong(s: String): Long =
    s.foldLeft(0L)((acc, c) => acc * 26 + (c - 'a' + 1))

  test("base26 is bijective and lowercase over [1, 10^6]") {
    check(Prop.forAll(Gen.chooseNum(1L, 1000000L)) { n =>
      val s = Base26.letters(n).toString
      s.nonEmpty && s.forall(c => c >= 'a' && c <= 'z') && lettersToLong(s) == n
    })
  }

  test("base26 ordering matches numeric ordering (same length) and length grows") {
    check(Prop.forAll(Gen.chooseNum(1L, 500000L), Gen.chooseNum(1L, 500000L)) { (a, b) =>
      val (sa, sb) = (Base26.letters(a).toString, Base26.letters(b).toString)
      if (sa.length == sb.length) (sa.compareTo(sb) < 0) == (a < b) || a == b
      else (sa.length < sb.length) == (a < b)
    })
  }

  // -- text stats ------------------------------------------------------

  private val genText: Gen[String] = {
    // letters, stopwords, CJK, an emoji (supplementary plane), ASCII and
    // NON-\s unicode whitespace (U+00A0 is part of a token for Java \s+)
    val atoms = Gen.oneOf("the", "cat", "The", "OF", "中文", "😀",
      "a b", "x1!", " ", "\t", "\n", "", "\r", "")
    Gen.listOf(atoms).map(_.mkString)
  }

  test("TextStats.compute matches an independent JVM reference on unicode text") {
    import org.apache.spark.unsafe.types.UTF8String
    val stopSet = new java.util.HashSet[UTF8String]()
    graft.text.TextAnalysis.Stopwords.foreach(w => stopSet.add(UTF8String.fromString(w)))
    val stops = graft.text.TextAnalysis.Stopwords.toSet
    check(Prop.forAll(genText) { s =>
      val toks = s.split("\\s+").filter(_.nonEmpty)
      val expHits = toks.count(t => stops.contains(UTF8String.fromString(t).toLowerCase.toString))
      val expLen = toks.map(t => t.codePointCount(0, t.length).toLong).sum
      val row = graft.functions.TextStats.compute(UTF8String.fromString(s), stopSet)
      row.getInt(0) == toks.length && row.getInt(1) == expHits && row.getLong(2) == expLen
    })
  }

  test("StopwordProfileHits.compute matches per-profile reference counts") {
    import org.apache.spark.unsafe.types.UTF8String
    val profiles = graft.text.TextAnalysis.LangProfiles.filter(_._2.nonEmpty).map(_._2)
    val sets = profiles.map { ws =>
      val set = new java.util.HashSet[UTF8String]()
      ws.foreach(w => set.add(UTF8String.fromString(w)))
      set
    }.toArray
    check(Prop.forAll(genText) { s =>
      val toks = s.split("\\s+").filter(_.nonEmpty)
        .map(t => UTF8String.fromString(t).toLowerCase.toString)
      val exp = profiles.map(p => toks.count(p.toSet.contains))
      val arr = graft.functions.StopwordProfileHits.compute(UTF8String.fromString(s), sets)
      exp.indices.forall(i => arr.getInt(i) == exp(i))
    })
  }

  // -- weeks -----------------------------------------------------------

  private val genDate: Gen[LocalDate] =
    Gen.chooseNum(-30000L, 30000L).map(LocalDate.ofEpochDay)

  test("thursdayFloor lands on a Thursday, within (d-6, d]") {
    check(Prop.forAll(genDate) { d =>
      val f = WeekBins.thursdayFloor(d)
      f.getDayOfWeek == java.time.DayOfWeek.THURSDAY &&
        !f.isAfter(d) && f.isAfter(d.minusDays(7))
    })
  }

  test("numpyWeekRange: every in-range date bins to the week containing it") {
    check(Prop.forAll(genDate, Gen.chooseNum(30L, 400L)) { (start, span) =>
      val stop = start.plusDays(span)
      val (edge, n) = WeekBins.numpyWeekRange(start, stop)
      n >= 1 && {
        val probe = start.plusDays(span / 2)
        val days = probe.toEpochDay - edge.toEpochDay
        days < 0 || days >= n * 7 || {
          val bin = (days / 7).toInt
          bin >= 0 && bin < n
        }
      }
    })
  }

  // -- tiling kernels --------------------------------------------------

  private val genImage: Gen[(Int, Int, Array[Float])] = for {
    h <- Gen.chooseNum(6, 20)
    w <- Gen.chooseNum(6, 20)
    px <- Gen.listOfN(h * w, Gen.chooseNum(1, 1000).map(_.toFloat))
  } yield (h, w, px.toArray)

  test("crop equals direct indexing for in-bounds windows") {
    check(Prop.forAll(genImage, Gen.chooseNum(0, 3), Gen.chooseNum(0, 3)) {
      case ((h, w, px), dr, dc) =>
        val r1 = dr; val c1 = dc
        val r2 = math.min(h, r1 + 4); val c2 = math.min(w, c1 + 4)
        val out = TileKernel.crop(px, 1, h, w, r1, r2, c1, c2)
        (r1 until r2).forall(r => (c1 until c2).forall(c =>
          out((r - r1) * (c2 - c1) + (c - c1)) == px(r * w + c)))
    }, n = 50)
  }

  test("intended border filter keeps exactly the in-bounds crops") {
    check(Prop.forAll(Gen.chooseNum(8, 40), Gen.chooseNum(8, 40),
      Gen.listOf(Gen.zip(Gen.chooseNum(0, 45), Gen.chooseNum(0, 45)))) { (h, w, pts) =>
      val cand = TileKernel.Candidates(pts.map(_._1).toArray, pts.map(_._2).toArray)
      val batch = 6; val half = 3
      val kept = TileKernel.borderFilter(cand, batch, h, w, faithful = false)
      kept.rs.indices.forall { i =>
        val r = kept.rs(i); val c = kept.cs(i)
        r - half >= 0 && r + half <= h && c - half >= 0 && c + half <= w
      } && kept.size == pts.count { case (r, c) =>
        r >= half && r + half <= h && c >= half && c + half <= w
      }
    }, n = 50)
  }

  test("gridSnap: at most one candidate per stride cell, first-come kept") {
    check(Prop.forAll(
      Gen.listOf(Gen.zip(Gen.chooseNum(0, 50), Gen.chooseNum(0, 50))),
      Gen.chooseNum(2, 10)) { (pts, stride) =>
      val cand = TileKernel.Candidates(pts.map(_._1).toArray, pts.map(_._2).toArray)
      val out = TileKernel.gridSnap(cand, stride)
      val cells = out.rs.indices.map(i => (out.rs(i) / stride, out.cs(i) / stride))
      cells.distinct.size == cells.size &&
        cells.toSet == pts.map { case (r, c) => (r / stride, c / stride) }.toSet
    }, n = 50)
  }

  test("cropPairHv LR window is the floor-divided HR window") {
    // all-ones images, no overlap suppression → every candidate accepted,
    // and each LR tile must equal the direct floor-div slice
    check(Prop.forAll(Gen.chooseNum(1, 5)) { nCand =>
      val scale = 3; val batch = 6; val half = 3
      val hrH = 30; val lrH = 10
      val hr = Array.fill(4 * hrH * hrH)(1.0f)
      val lr = Array.tabulate(4 * lrH * lrH)(_.toFloat + 1)
      val rs = Array.tabulate(nCand)(i => 4 + (i * 5) % 22)
      val cs = Array.tabulate(nCand)(i => 4 + (i * 7) % 22)
      val tiles = TileKernel.cropPairHv(hr, hrH, hrH, lr, lrH, lrH, 4,
        TileKernel.Candidates(rs, cs), batch, scale, overlap = false, 1.0)
      tiles.length == nCand && tiles.forall { t =>
        val expect = TileKernel.crop(lr, 4, lrH, lrH,
          Math.floorDiv(t.r - half, scale), Math.floorDiv(t.r + half, scale),
          Math.floorDiv(t.c - half, scale), Math.floorDiv(t.c + half, scale))
        t.lr.toSeq == expect.toSeq
      }
    }, n = 30)
  }

  // -- hashes ----------------------------------------------------------

  test("sorted_jaccard merge equals naive set jaccard") {
    check(Prop.forAll(
      Gen.listOf(Gen.chooseNum(0L, 50L)), Gen.listOf(Gen.chooseNum(0L, 50L))) { (a, b) =>
      val sa = a.distinct.sorted.toArray
      val sb = b.distinct.sorted.toArray
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val got = SortedJaccard.compute(new GenericArrayData(sa), new GenericArrayData(sb))
      if (sa.isEmpty && sb.isEmpty) got == null
      else {
        val inter = sa.toSet.intersect(sb.toSet).size
        val expect = inter.toDouble / (sa.length + sb.length - inter)
        got.asInstanceOf[Double] == expect
      }
    })
  }

  test("minhash signature: deterministic, length m, permutation-sensitive min") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))) { toks =>
      val arr = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
      val s1 = MinHash.signature(arr, 1, 16)
      val s2 = MinHash.signature(arr, 1, 16)
      s1.numElements() == 16 &&
        (0 until 16).forall(i => s1.getLong(i) == s2.getLong(i))
    }, n = 50)
  }

  test("portable minhash tolerates null token elements (folds as empty runs)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val as = Array.tabulate(8)(PortableMinHash.a)
    val bs = Array.tabulate(8)(PortableMinHash.b)
    val withNull = new GenericArrayData(
      Array[Any](UTF8String.fromString("a"), null, UTF8String.fromString("b")))
    val withEmpty = new GenericArrayData(
      Array[Any](UTF8String.fromString("a"), UTF8String.fromString(""),
        UTF8String.fromString("b")))
    val s1 = PortableMinHash.signature(withNull, 2, 8, as, bs)
    val s2 = PortableMinHash.signature(withEmpty, 2, 8, as, bs)
    assert((0 until 8).forall(i => s1.getLong(i) == s2.getLong(i)))
    // xxhash64 variant already tolerated nulls — keep that pinned too
    assert(MinHash.signature(withNull, 2, 8).numElements() == 8)
  }

  // -- round-6 kernels -------------------------------------------------

  test("zval interleave is a bijection on 16-bit pairs and monotone per axis") {
    import graft.functions.ZOrder
    val g16 = Gen.chooseNum(0L, 65535L)
    check(Prop.forAll(g16, g16) { (x, y) =>
      val z = ZOrder.interleave(x, y)
      // de-interleave recovers both inputs exactly
      var xr = 0L; var yr = 0L
      for (b <- 0 until 16) {
        xr |= ((z >> (2 * b)) & 1L) << b
        yr |= ((z >> (2 * b + 1)) & 1L) << b
      }
      xr == x && yr == y && z >= 0 && z < (1L << 32)
    })
  }

  test("kmv sketch is insertion-order and duplication invariant") {
    import graft.functions.Kmv
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))) { keys =>
      def sketch(ks: Seq[Long]) = {
        val buf = new java.util.TreeSet[java.lang.Long]()
        ks.foreach(k => Kmv.add(buf, Kmv.hash63(k), 16))
        Kmv.stats(buf, 16)
      }
      val base = sketch(keys)
      sketch(scala.util.Random.javaRandomToRandom(
        new java.util.Random(keys.hashCode.toLong)).shuffle(keys)) == base &&
        sketch(keys ++ keys) == base &&
        base._3 >= 0.0
    }, n = 50)
  }

  test("bloom filter never false-negatives an inserted key") {
    import graft.functions.Bloom
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))) { keys =>
      val bits = new Array[Long](1024 / 64)
      keys.foreach { k =>
        (0 until 4).foreach(i => Bloom.setBit(bits, Bloom.position(k, i, 1024)))
      }
      keys.forall { k =>
        (0 until 4).forall(i => Bloom.getBit(bits, Bloom.position(k, i, 1024)))
      }
    }, n = 50)
  }

  test("repetition stats agree with a naive reference on random word strings") {
    import graft.functions.Repetition
    import org.apache.spark.unsafe.types.UTF8String
    val word = Gen.oneOf("a", "b", "ab", "ba", "x", "", "aa")
    val genDoc = Gen.listOf(word).map(_.mkString(" "))
    check(Prop.forAll(genDoc) { text =>
      val row = Repetition.compute(UTF8String.fromString(text))
      val words = text.split(" ", -1).toSeq
      def top(n: Int): Option[(String, Int)] =
        if (words.length < n) None
        else {
          val grams = words.sliding(n).map(_.mkString(" ")).toSeq
          val counts = grams.groupBy(identity).view.mapValues(_.size)
          Some(counts.toSeq.minBy { case (g, c) => (-c, g) })
        }
      val okCounts = row.getInt(0) == words.length &&
        row.getInt(1) == words.distinct.length
      val ok2 = top(2) match {
        case None => row.isNullAt(2)
        case Some((g, c)) => row.getUTF8String(2).toString == g && row.getInt(3) == c
      }
      val ok3 = top(3) match {
        case None => row.isNullAt(4)
        case Some((g, c)) => row.getUTF8String(4).toString == g && row.getInt(5) == c
      }
      okCounts && ok2 && ok3
    })
  }

  test("misra-gries: heavy items survive any split point; counts are lower bounds") {
    import graft.functions.MisraGries
    import org.apache.spark.unsafe.types.UTF8String
    import scala.collection.mutable
    val genItems = Gen.listOfN(300, Gen.chooseNum(0, 30).map(i => s"w$i"))
    check(Prop.forAll(genItems, Gen.chooseNum(2, 12), Gen.chooseNum(0, 299)) {
      (items, k, cut) =>
        def sketch(xs: Seq[String]) = {
          val buf = mutable.HashMap.empty[UTF8String, Long]
          xs.foreach(x => MisraGries.add(buf, UTF8String.fromString(x), 1L, k))
          buf
        }
        val (a, b) = items.splitAt(cut % (items.size + 1))
        val m = sketch(a)
        MisraGries.merge(m, sketch(b), k)
        val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val heavy = exact.filter(_._2 > items.size.toLong / (k + 1)).keys
        heavy.forall(t => m.contains(UTF8String.fromString(t))) &&
          m.forall { case (t, c) => c <= exact(t.toString) } &&
          m.size <= k
    })
  }

  test("interval-overlap canonical bucket: exactly one emitting bucket per overlapping pair") {
    val genIv = for {
      s <- Gen.chooseNum(-1000L, 1000L)
      len <- Gen.chooseNum(1L, 400L)
    } yield (s, s + len)
    check(Prop.forAll(genIv, genIv, Gen.chooseNum(1L, 500L)) {
      case ((ls, le), (rs, re), w) =>
        def buckets(s: Long, e: Long): Set[Long] =
          (Math.floorDiv(s, w) to Math.floorDiv(e - 1, w)).toSet
        val overlaps = ls < re && rs < le
        if (!overlaps) Prop.passed
        else {
          val shared = buckets(ls, le) & buckets(rs, re)
          val canonical = Math.floorDiv(math.max(ls, rs), w)
          // the canonical bucket is always covered by BOTH sides, and it is
          // the unique shared bucket that the join's filter keeps
          Prop(shared.contains(canonical) &&
            shared.count(_ == canonical) == 1)
        }
    })
  }

  test("pq encode is the strict argmin; adc equals the naive reconstruction score") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType}
    import graft.functions.{PqAdcExpr, PqEncodeExpr}
    val genF = Gen.chooseNum(-1000, 1000).map(_ / 100.0f)
    val m = 4; val sub = 3; val kc = 5
    val genVec = Gen.listOfN(m * sub, genF)
    val genCb = Gen.listOfN(m * kc * sub, genF).map { fs =>
      Array.tabulate(m)(mi => Array.tabulate(kc)(j =>
        fs.slice((mi * kc + j) * sub, (mi * kc + j + 1) * sub).toArray))
    }
    check(Prop.forAll(genVec, genVec, genCb) { (v, q, cb) =>
      val enc = PqEncodeExpr(Literal.create(v, ArrayType(FloatType)), cb)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val codes = enc.toIntArray()
      val naive = (0 until m).map { mi =>
        val xs = v.slice(mi * sub, (mi + 1) * sub)
        (0 until kc).minBy { j =>
          val d = xs.zip(cb(mi)(j)).map { case (a, b) =>
            val t = a.toDouble - b.toDouble; t * t
          }.sum
          (d, j)
        }
      }
      val sameCodes = codes.toSeq == naive
      val adc = PqAdcExpr(Literal.create(q, ArrayType(FloatType)),
          Literal.create(codes.toSeq, ArrayType(IntegerType)), cb)
        .eval(null).asInstanceOf[Double]
      val recon = (0 until m).flatMap(mi => cb(mi)(codes(mi)))
      val dot = q.zip(recon).map { case (a, b) => a.toDouble * b.toDouble }.sum
      val denom = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(recon.map(x => x.toDouble * x.toDouble).sum)
      val expect = if (denom == 0.0) 0.0 else dot / denom
      sameCodes && math.abs(adc - expect) <= 1e-9 * math.max(1.0, math.abs(expect))
    }, n = 60)
  }

  // -- BPE merge kernel (q185/q186) ------------------------------------

  private def bpeEval(in: Seq[String], l: String, r: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.unsafe.types.UTF8String
    val arr = new GenericArrayData(
      in.map(s => UTF8String.fromString(s): Any).toArray)
    graft.functions.BpeMergeExpr(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), l, r)
      .nullSafeEval(arr).asInstanceOf[ArrayData]
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.asInstanceOf[UTF8String].toString).toSeq
  }

  private val genSym: Gen[String] = Gen.oneOf("a", "b", "c", "aa", "ab")
  private val genSeq: Gen[List[String]] = Gen.listOfN(8, genSym).map(_.take(8))

  test("BPE merge: chars preserved, one pass is a fixed point, no (l,r) " +
      "adjacency survives, length bounds") {
    check(Prop.forAll(genSeq, genSym, genSym) { (in, l, r) =>
      val out = bpeEval(in, l, r)
      val charsKept = out.mkString == in.mkString
      val fixedPoint = bpeEval(out, l, r) == out
      val noPairLeft = out.zip(out.drop(1)).forall(p => !(p._1 == l && p._2 == r))
      val merged = in.length - out.length
      val bounds = merged >= 0 && out.length >= (in.length + 1) / 2
      charsKept && fixedPoint && noPairLeft && bounds
    }, n = 300)
  }

  // -- trained-vocab subword walk (q184) -------------------------------

  private val genWord: Gen[String] =
    Gen.listOfN(10, Gen.oneOf(Gen.alphaLowerChar, Gen.const('é'), Gen.const('9')))
      .map(_.mkString).flatMap(s => Gen.chooseNum(0, s.length).map(s.take))

  test("subwordCountVocab: bounds, unit self-segmentation, agreement with " +
      "the built-in long-key walk on the built-in vocab") {
    import graft.text.TextAnalysis._
    val sorted = buildSubwordVocab(SubwordVocab)
    val maxLen = SubwordVocab.map(_.length).max
    check(Prop.forAll(genWord) { w =>
      val n = subwordCountVocab(w, sorted, maxLen)
      val cp = w.codePointCount(0, w.length)
      val boundsOk =
        if (w.isEmpty) n == 0
        else n >= (w.length + maxLen - 1) / maxLen && n <= cp
      // independent implementations agree everywhere (sorted-string probe
      // vs length-tagged long keys)
      boundsOk && n == subwordCount(w)
    }, n = 300)
  }
}
