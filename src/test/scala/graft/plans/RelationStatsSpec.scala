package graft.plans

/** Pins the r10 verdict item-4 contract: the adaptive ANN family's corpus
  * count comes from parquet FOOTER METADATA for table-backed frames — no
  * scan job — and falls back to an executed count() exactly when the plan
  * could change the row count, so the derived bits schedule is
  * byte-identical to the old eager-count implementation.
  */
class RelationStatsSpec extends graft.SparkSpec {
  import spark.implicits._

  test("footerRowCount: exact on a plain parquet table read, with zero Spark jobs") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val expected = emb.count()
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val n = try {
      val n = RelationStats.footerRowCount(emb)
      // listener bus is async; drain deterministically before reading the
      // counter (ADVICE r11: a fixed sleep races under CI load)
      org.apache.spark.GraftTestBridge.waitUntilListenerBusEmpty(spark.sparkContext)
      n
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs == 0, s"footerRowCount ran $jobs Spark jobs — it must be metadata-only")
    assert(n.contains(expected))
  }

  test("footerRowCount: None whenever the plan could change the row count") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    assert(RelationStats.footerRowCount(emb.filter($"vec_id" > 10)).isEmpty,
      "a filtered frame must fall back to count()")
    assert(RelationStats.footerRowCount(Seq((1L, 2L)).toDF("a", "b")).isEmpty,
      "an in-memory frame must fall back to count()")
    // count-preserving projection above the scan keeps the fast path
    assert(RelationStats.footerRowCount(emb.select($"vec_id")).isDefined,
      "a projection is count-preserving and must stay on the metadata path")
  }

  test("Similarity.corpusCount agrees with count() on the embeddings table") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    assert(graft.ops.Similarity.corpusCount(emb) == emb.count())
  }

  test("footer counts are memoized: one footer pass per table per session") {
    // r11 verdict item 4: the batch/adaptive ANN family sizes itself off
    // the same table repeatedly; footers must be opened once per session,
    // not per invocation. Footer I/O is driver-side (no Spark listener
    // sees it), so the contract is asserted through the read counter.
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val first = RelationStats.footerRowCount(emb)
    assert(first.isDefined)
    val readsAfterFirst = RelationStats.footerReads.get()
    val second = RelationStats.footerRowCount(
      graft.Tables.embeddings(spark, "/root/testdata/sf0.001"))
    assert(second == first)
    assert(RelationStats.footerReads.get() == readsAfterFirst,
      "second invocation re-opened footers — the memo must serve it")
  }

  test("cosineNearDupKMeans auto-k sizing runs zero Spark jobs on a plain table read") {
    // r11 verdict item 3: auto-k used an eager emb.count() — the exact
    // pattern RelationStats was built to remove. The k schedule itself is
    // byte-identical (same n either way; corpusCount's contract).
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    RelationStats.footerRowCount(emb) // warm the memo so the assert below is pure sizing
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val k = try {
      val k = graft.ops.Similarity.autoQuantizerK(emb)
      org.apache.spark.GraftTestBridge.waitUntilListenerBusEmpty(spark.sparkContext)
      k
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs == 0, s"auto-k sizing ran $jobs Spark jobs — it must be metadata-only")
    assert(k == math.max(16L, emb.count() / 2000L).toInt)
  }
}
