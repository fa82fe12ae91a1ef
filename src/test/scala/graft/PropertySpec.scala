package graft

import java.sql.Timestamp
import graft.etl.TaxiFeatures
import graft.functions.Text
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5 test plan item 3): scalacheck
  * generators with pinned seeds (the scalatest-scalacheck bridge artifact
  * isn't in the offline cache, so cases are drawn explicitly — same
  * coverage, deterministic replay).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("time_period is a total partition of hours 0-23 into the 4 reference bins") {
    val out = (0 to 23).toDF("hour")
    val periods = TaxiFeatures.timePeriod(out).select($"time_period").as[String].collect()
    assert(periods.length == 24)
    assert(periods.toSet == Set("morning", "afternoon", "evening", "night"))
    assert(periods.count(_ == "morning") == 6 && periods.count(_ == "afternoon") == 5)
    assert(periods.count(_ == "evening") == 7 && periods.count(_ == "night") == 6)
  }

  test("is_holiday is binary and matches the weekend predicate for arbitrary timestamps") {
    val millis = samples(Gen.choose(0L, 4102444800000L), 60)
    val df = millis.map(m => Tuple1(new Timestamp(m))).toDF("tpep_pickup_datetime")
    val out = TaxiFeatures.timeFeatures(df)
      .select($"day_of_week", $"is_holiday").as[(Int, Int)].collect()
    assert(out.length == 60)
    out.foreach { case (dow, hol) =>
      assert(hol == 0 || hol == 1)
      assert((hol == 1) == (dow == 1 || dow == 7), s"dow=$dow hol=$hol")
    }
  }

  test("normalized text is idempotent; fingerprint stable under formatting noise") {
    val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val textGen = Gen.listOfN(8, wordGen).map(_.mkString(" "))
    val texts = samples(textGen, 25)
    val df = texts.map(t => (t, "  " + t.toUpperCase.replace(" ", "   ") + " !! "))
      .toDF("a", "b")
    val rows = df.select(
      (Text.normalized(Text.normalized($"a")) === Text.normalized($"a")).as("idem"),
      (Text.fingerprint($"a") === Text.fingerprint($"b")).as("stable"))
      .as[(Boolean, Boolean)].collect()
    rows.foreach { case (idem, stable) =>
      assert(idem, "normalize not idempotent")
      assert(stable, "fingerprint unstable under formatting noise")
    }
  }

  test("token-set Jaccard is within [0,1] and reflexive = 1") {
    val listGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e", "f"))
    val pairs = samples(Gen.zip(listGen, listGen), 25)
    val df = pairs.map { case (w1, w2) => (w1.mkString(" "), w2.mkString(" ")) }.toDF("x", "y")
    def jac(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val ta = array_distinct(Text.tokensLower(a))
      val tb = array_distinct(Text.tokensLower(b))
      size(array_intersect(ta, tb)) * lit(1.0) /
        (size(ta) + size(tb) - size(array_intersect(ta, tb)))
    }
    df.select(jac($"x", $"y"), jac($"x", $"x")).as[(Double, Double)].collect()
      .foreach { case (j, jSelf) =>
        assert(j >= 0.0 && j <= 1.0, s"jaccard $j out of range")
        assert(jSelf == 1.0, s"self-jaccard $jSelf != 1")
      }
  }

  test("histSpeedAgg join-back preserves row count and leaves no null speeds") {
    val rowGen = Gen.zip(Gen.choose(0, 3), Gen.choose(1.0, 50.0), Gen.choose(1.0, 120.0))
    (0 until 3).foreach { round =>
      val rows = samples(rowGen, 30).zipWithIndex
        .map { case ((k, d, dur), i) => (k + round, d + i, dur) }
      val df = rows.toDF("PULocationID", "trip_distance", "duration_min")
        .withColumn("DOLocationID", lit(0))
        .withColumn("time_period", lit("morning"))
        .withColumn("day_of_week", lit(2))
      val out = TaxiFeatures.withHistAvgSpeed(df)
      assert(out.count() == rows.size)
      assert(out.filter($"avg_speed_time_period".isNull).count() == 0)
    }
  }

  test("simhash is deterministic and order-insensitive (token-multiset function)") {
    val listGen = Gen.nonEmptyListOf(Gen.oneOf("w1", "w2", "w3", "w4", "w5"))
    val cases = samples(listGen, 20)
    val rnd = new scala.util.Random(7)
    val df = cases.map(ws => (ws.mkString(" "), rnd.shuffle(ws).mkString(" "))).toDF("a", "b")
    df.select(Text.simhash64($"a"), Text.simhash64($"a"), Text.simhash64($"b"))
      .as[(Long, Long, Long)].collect()
      .foreach { case (h1, h1b, h2) =>
        assert(h1 == h1b, "simhash not deterministic")
        assert(h1 == h2, "simhash should depend on the token multiset, not order")
      }
  }

  test("minhashSignatures is a set function: order- and duplicate-insensitive, in-range") {
    val p = 2147483647L
    val listGen = Gen.nonEmptyListOf(Gen.choose(0L, p - 1))
    val cases = samples(listGen, 25)
    val rnd = new scala.util.Random(13)
    val df = cases.map(hs => (hs, rnd.shuffle(hs) ++ hs.take(3))).toDF("a", "b")
    df.select(Text.minhashSignatures($"a", 12), Text.minhashSignatures($"b", 12))
      .as[(Seq[Long], Seq[Long])].collect()
      .foreach { case (sa, sb) =>
        assert(sa == sb, "minhash signature must depend only on the shingle SET")
        assert(sa.size == 12 && sa.forall(v => v >= 0 && v < p), s"out of range: $sa")
      }
  }

  test("simhashDet stays within its 62-bit domain and is order-insensitive") {
    val listGen = Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "x9"))
    val cases = samples(listGen, 20)
    val rnd = new scala.util.Random(17)
    val df = cases.map(ws => (ws.mkString(" "), rnd.shuffle(ws).mkString(" "))).toDF("a", "b")
    df.select(Text.simhashDet($"a"), Text.simhashDet($"b"))
      .as[(Long, Long)].collect()
      .foreach { case (h1, h2) =>
        assert(h1 == h2, "det simhash must be a token-multiset function")
        assert((h1 >>> 62) == 0, s"bits above 61 set: $h1")
        assert(h1 >= 0, "det simhash must be non-negative")
      }
  }

  test("rollingHash and kgramHashes stay within [0, 2^31-1)") {
    val p = 2147483647L
    val strGen = Gen.listOfN(20, Gen.alphaNumChar).map(_.mkString)
    val df = samples(strGen, 30).toDF("s")
    df.select(Text.rollingHash($"s"), Text.kgramHashes($"s", 8))
      .as[(Long, Seq[Long])].collect()
      .foreach { case (h, ks) =>
        assert(h >= 0 && h < p, s"rollingHash out of range: $h")
        assert(ks.forall(k => k >= 0 && k < p), s"kgram hash out of range")
        assert(ks.size == 13, s"20-char string must yield 13 8-grams, got ${ks.size}")
      }
  }

  test("AsOf.floorDiv == Math.floorDiv for arbitrary longs incl. negatives") {
    // the time-bucketing kernel (pmod-adjusted long `div`) must agree with
    // the JDK's integer floorDiv over (Long.MinValue + n, Long.MaxValue] —
    // the truncation-vs-floor divergence it exists to eliminate lives in
    // negative inputs, and the long-arithmetic form (r7 advice) must hold
    // beyond 2^53 where double division would round before flooring
    val widths = Seq(3600L, 86400L, 7L, 600L)
    val vals = samples(Gen.chooseNum(Long.MinValue + 100000L, Long.MaxValue), 200) ++
      Seq(-1L, 0L, 1L, -3600L, 3599L, -3601L, -86400L, 86399L,
        (1L << 53) + 1L, -(1L << 53) - 1L, (1L << 60) + 7L, -(1L << 60) - 7L,
        Long.MaxValue, Long.MinValue + 86401L)
    widths.foreach { n =>
      val got = vals.toDF("v")
        .select(graft.ops.AsOf.floorDiv(col("v"), n).as("fd"))
        .as[Long].collect()
      vals.zip(got).foreach { case (v, fd) =>
        assert(fd == Math.floorDiv(v, n), s"floorDiv($v, $n): got $fd, want ${Math.floorDiv(v, n)}")
      }
    }
  }

  test("TopKByPrice merge is associative/commutative: any partitioning yields the global top-k") {
    import graft.functions.{PricedRow, TopKByPrice => T}
    val rowGen = for {
      c <- Gen.choose(-1000L, 1000L) // negative cents included — ordering must still hold
      k <- Gen.choose(0L, 50L)       // small key space forces cents ties
    } yield PricedRow(c, k)
    val caseGen = for {
      rows <- Gen.listOfN(40, rowGen)
      cuts <- Gen.listOfN(3, Gen.choose(0, 40))
    } yield (rows, cuts.sorted)
    samples(caseGen, 30).foreach { case (rows, cuts) =>
      val expected = rows.sortBy(r => (-r.cents, r.key)).take(T.k)
      // arbitrary 4-way partitioning, each chunk reduced then merged in
      // arbitrary (reversed) order — the distribution the executor sees
      val chunks = (0 +: cuts :+ rows.length).sliding(2).map {
        case Seq(a, b) => rows.slice(a, b)
      }.toSeq
      val partials = chunks.map(_.foldLeft(T.zero)(T.reduce))
      val merged = partials.reverse.foldLeft(T.zero)(T.merge)
      assert(T.finish(merged) == expected,
        s"partitioned merge diverged from the sequential top-k for $rows / cuts $cuts")
    }
  }

  test("Misra-Gries merge dominance: any partitioning keeps the MG guarantee and error budget") {
    // the mergeable-summaries contract q_topk_freq's relational form relies
    // on (Agarwal et al. PODS'12): for ANY split of a multiset into parts,
    // summarize each part (canonical prune to k), fold the summaries in
    // arbitrary order, and the result must (a) never overcount, (b) bound
    // every kept token's undercount by the accumulated error, (c) certify
    // every dropped token light (count <= err), (d) keep err <= N/(k+1)
    import graft.ops.Sketches
    val k = 5
    val caseGen = for {
      n <- Gen.choose(20, 300)
      toks <- Gen.listOfN(n, Gen.frequency(
        (6, Gen.oneOf("a", "b", "c")),          // heavy hitters
        (4, Gen.choose(0, 40).map("t" + _))))   // long tail
      nCuts <- Gen.choose(0, 6)
      cuts <- Gen.listOfN(nCuts, Gen.choose(0, n))
    } yield (toks, cuts.sorted)
    samples(caseGen, 120).foreach { case (toks, cuts) =>
      val f = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val chunks = (0 +: cuts :+ toks.length).distinct.sorted.sliding(2).map {
        case Seq(a, b) => toks.slice(a, b)
      }.toSeq
      val partials = chunks.map { c =>
        Sketches.mgSummary(c.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }, k)
      }
      val (m, err) = partials.reverse.reduceLeft((a, b) => Sketches.mgMerge(a, b, k))
      m.foreach { case (t, w) =>
        assert(w <= f(t), s"overcount: $t has weight $w > true ${f(t)}")
        assert(f(t) - w <= err, s"undercount beyond budget: $t ${f(t)} - $w > $err")
      }
      f.foreach { case (t, c) =>
        if (!m.contains(t)) assert(c <= err, s"dropped heavy hitter $t: $c > err $err")
      }
      assert(err <= toks.length.toLong / (k + 1),
        s"error budget ${err} exceeds N/(k+1) = ${toks.length / (k + 1)}")
    }
  }
}
