package graft.plans

import graft.SparkSpec
import graft.functions.{Text, Vectors => V}
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = (0 until 50).map { i =>
    val r = new scala.util.Random(i)
    (i.toLong, Array.fill(64)(r.nextFloat() * 2 - 1), Array.fill(64)(r.nextFloat() * 2 - 1))
  }.toDF("id", "a", "b")

  test("graft_dot is registered via GraftExtensions and callable from SQL") {
    vecs.createOrReplaceTempView("vecs_t")
    val n = spark.sql("SELECT graft_dot(a, b) AS d FROM vecs_t").count()
    assert(n == 50)
  }

  test("native dot is bit-identical to the higher-order-function fold") {
    val rows = vecs.select(
      V.dot($"a", $"b").as("hof"),
      V.dotNative($"a", $"b").as("native"))
      .as[(Double, Double)].collect()
    rows.foreach { case (h, n) => assert(h == n, s"$h != $n") }
  }

  test("native dot handles float input via implicit cast, nulls, and length mismatch") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f))),
      (Some(Array(1.0f, 2.0f, 9.9f)), Some(Array(10.0f, 10.0f))))
      .toDF("a", "b")
    val out = df.select(V.dotNative($"a", $"b")).as[Option[Double]].collect()
    assert(out(0).contains(11.0))
    assert(out(1).isEmpty) // null array → null
    assert(out(2).isEmpty) // length mismatch → null, same as the HOF fold
  }

  test("graft_dot rejects wrong arity with an AnalysisException, not an internal error") {
    vecs.createOrReplaceTempView("vecs_arity_t")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_dot(a) FROM vecs_arity_t").collect()
    }
    assert(e.getMessage.contains("graft_dot"), e.getMessage)
  }

  test("native dot stays inside WholeStageCodegen over a parquet scan") {
    // needs a file-backed source — a local relation constant-folds into
    // LocalTableScan before codegen is even considered
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = emb.select(V.dotNative($"embedding", $"embedding"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert("\\*\\(\\d+\\) Project \\[graft_dot".r.findFirstIn(plan).isDefined,
      s"graft_dot project not codegen'd:\n$plan")
  }

  test("graft_kgrams sliding-window hashes are bit-identical to the HOF fold") {
    val rnd = new scala.util.Random(23)
    val alphabet = "abcdefghij0123456789 .,;"
    val strs = (0 until 40).map { i =>
      val n = rnd.nextInt(60) // includes < k and empty
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } :+ "" :+ "short" :+ "exactly8" :+ "ü unicode bmp çhars here"
    val df = strs.toDF("s")
    val rows = df.select(
      Text.kgramHashes($"s", 8).as("hof"),
      Text.kgramHashesNative($"s", 8).as("native"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (h, n) => assert(h == n, s"kgram mismatch: $h vs $n") }
    // null input → null, matching the HOF's null propagation
    val nulls = Seq[Option[String]](None).toDF("s")
      .select(Text.kgramHashesNative($"s", 8)).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("graft_kgrams stays inside WholeStageCodegen over a parquet scan") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = docs.select(Text.kgramHashesNative($"text", 8))
      .queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[graft_kgrams".r.findFirstIn(plan).isDefined,
      s"graft_kgrams project not codegen'd:\n$plan")
  }

  test("graft_simhash is bit-identical to the HOF simhashDet, incl. whitespace edge cases") {
    val rnd = new scala.util.Random(31)
    val words = Array("alpha", "beta", "Gamma7", "x", "09", ".,;")
    val strs = (0 until 30).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => words(rnd.nextInt(words.length)))
        .mkString(if (rnd.nextBoolean()) " " else "  ")
    } ++ Seq(
      "",            // empty → single empty token (hash = seed)
      "   ",         // all spaces → trim → empty token
      "\ta b",       // leading tab survives Spark trim → leading empty token
      "a b\t",       // trailing tab → trailing empty token (split limit −1)
      "a\nb\t c",    // mixed whitespace separators
      "ü çhars here")
    val df = strs.toDF("s")
    val rows = df.select(
      Text.simhashDet($"s").as("hof"),
      Text.simhashDetNative($"s").as("native"))
      .as[(Long, Long)].collect()
    rows.zip(strs).foreach { case ((h, n), s) =>
      assert(h == n, s"simhash mismatch on ${s.replace("\n", "\\n").replace("\t", "\\t")}: $h vs $n")
    }
  }

  test("graft_simhash64 is bit-identical to the HOF seeded simhash64, incl. whitespace edges") {
    val rnd = new scala.util.Random(47)
    val words = Array("alpha", "beta", "Gamma7", "x", "09", ".,;", "über")
    val strs = (0 until 30).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => words(rnd.nextInt(words.length)))
        .mkString(if (rnd.nextBoolean()) " " else "  ")
    } ++ Seq("", "   ", "\ta b", "a b\t", "a\nb\t c", "ü çhars here")
    val df = strs.toDF("s")
    val rows = df.select(
      Text.simhash64($"s").as("hof"),
      Text.simhash64Native($"s").as("native"))
      .as[(Long, Long)].collect()
    rows.zip(strs).foreach { case ((h, n), s) =>
      assert(h == n, s"simhash64 mismatch on ${s.replace("\n", "\\n").replace("\t", "\\t")}: $h vs $n")
    }
  }

  test("rollingHash/winnowFingerprint: integer math, overlap detection, edge cases") {
    val df = Seq(
      ("abcdefghij", "abcdefghij"),          // identical
      ("abcdefghij", "XYZabcdefghijXYZ"),    // containment
      ("abcdefghij", "zzzzzzzzzz"),          // disjoint
      ("short", "short"),                     // < k
      ("", "")).toDF("x", "y")
    val rows = df.select(
      Text.rollingHash($"x"), Text.rollingHash($"y"),
      Text.winnowFingerprint($"x", 8), Text.winnowFingerprint($"y", 8))
      .as[(Long, Long, Option[Long], Option[Long])].collect()
    assert(rows(0)._1 == rows(0)._2)                 // deterministic
    assert(rows(0)._3 == rows(0)._4)
    assert(rows(1)._3.isDefined && rows(1)._4.isDefined)
    assert(rows(1)._3 == rows(1)._4 ||               // shared min 8-gram likely
      rows(1)._4.get <= rows(1)._3.get)              // superset min can only be ≤
    assert(rows(2)._3 != rows(2)._4)                 // disjoint content differs
    assert(rows(3)._3.isEmpty)                       // < k → null
    assert(rows(4)._1 == 7L)                         // empty → seed
  }
}
