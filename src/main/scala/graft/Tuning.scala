package graft

import org.apache.spark.sql.DataFrame

/** Centralized test-scale partition sizing (r3 verdict #6).
  *
  * The driver's test parquet is one row group per table, so a scan is ONE
  * task no matter how small `maxPartitionBytes` is — per-row
  * expression-heavy queries (shingling, simhash votes) serialize, and the
  * MLlib LSH bucket joins at test SF drown in task overhead at 32 shuffle
  * partitions. Those are FIXTURE artifacts, not properties of the
  * operators: at 100 TB a scan is already thousands of tasks and the
  * bucket joins are the scalable path.
  *
  * Rather than scatter `repartition(defaultParallelism)` / `coalesce(8)`
  * through query bodies (where a production user could cargo-cult them),
  * every such knob routes through here and is a NO-OP unless the session
  * opts in with `spark.graft.fixturePartitioning=true` — Verify, Bench and
  * the test session set it; a production session inherits its source
  * partitioning untouched.
  */
object Tuning {

  /** Session opt-in flag for the fixture partition-sizing knobs. */
  val Key = "spark.graft.fixturePartitioning"

  private def enabled(df: DataFrame): Boolean =
    df.sparkSession.conf.get(Key, "false").toBoolean

  /** Spread per-row expression-heavy work across all cores (the
    * single-row-group test files scan as one task). No-op unless the
    * session sets [[Key]]. */
  def spread(df: DataFrame): DataFrame =
    if (enabled(df)) df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    else df

  /** Compact to a few fat partitions (per-bucket work at test SF is tiny,
    * so task overhead dominates otherwise). No-op unless the session sets
    * [[Key]]. */
  def compact(df: DataFrame, n: Int = 8): DataFrame =
    if (enabled(df)) df.coalesce(n) else df

  /** Stateful-streaming state-partition sizing. The state-store instance
    * count per stateful operator is pinned to `spark.sql.shuffle.partitions`
    * at a query's FIRST micro-batch and baked into its checkpoint, so it is
    * a per-query launch-time decision, independent of the batch session's
    * shuffle width. At fixture scale, 32 partitions means 32 store commits
    * (×4 for a stream-stream join: two sides × key/index stores) per
    * micro-batch over kilobytes of state — pure overhead. Measured on
    * q_stream_join at sf0.1: 8.5 s → 2.9 s steady-state by sizing to 4;
    * every stateful q_stream_* drops ~2×. At 100 TB you size this UP with
    * state volume and throughput (and it must stay fixed for the life of
    * the checkpoint — which is why each graft stream run takes a fresh
    * one). Runs `f` with the conf temporarily lowered; restores after the
    * started query terminates. No-op unless the session opts in via
    * [[Key]] (a production session keeps its own sizing).
    */
  def withStreamStatePartitions[T](spark: org.apache.spark.sql.SparkSession,
                                   n: Int = 4)(f: => T): T =
    if (!spark.conf.get(Key, "false").toBoolean) f
    else {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, n.toString)
      try f finally spark.conf.set(key, prev)
    }

  /** Production state-store posture for the STATEFUL streaming family
    * (sessionize / stream-stream joins / dedup) — the configuration a
    * 100 TB deployment sets, pinned in code because the r10 StreamStateProbe
    * MEASURED the failure mode it prevents (SCALE.md "Streaming state
    * volume at 100×"): key-population state grows ×100 with the corpus and
    * q_stream_dedup's key state reached **1.73 GB of executor heap** under
    * the default HDFS-backed provider at sf10, vs 48 MB heap + 195 MB SST
    * under RocksDB — on a real cluster the default provider's state
    * competes with shuffle/execution memory and OOMs first. WINDOW state
    * (tumbling/hopping aggregates) measured calendar-bound (flat at 100×),
    * so watermarked window aggregates may keep the default provider.
    *
    * Apply at session build for any stateful stream whose key population
    * scales with the corpus:
    * {{{ scaleStreamingConf.foreach { case (k, v) => builder.config(k, v) } }}}
    * Fixture runs keep the default provider (state is kilobytes there);
    * StreamStateStoreParitySpec pins output equality across both backends
    * via this constant, so the posture swap can never change results. */
  def scaleStreamingConf: Map[String, String] = Map(
    graft.streaming.StreamSessionize.StateStoreKey -> "rocksdb")
}
