package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: time the q_stream_* family (steady-state, fixture
  * memoized) under the CURRENT session conf, plus the equivalent batch
  * join as the machinery-free floor. Args: [sfDir] [statePartitions].
  * Used to size the streaming state-partition override empirically.
  */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(graft.Tuning.Key, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.lift(1).foreach { n =>
      println(s"[profile] shuffle.partitions=$n for the streaming runs")
      spark.conf.set("spark.sql.shuffle.partitions", n)
    }
    val names = Seq("q_stream_join", "q_stream_dedup", "q_stream_sessionize",
      "q_stream_windowed", "q_stream_hopping", "q_stream_fbsink")
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        qs(n)(spark, dir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $n%-22s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    // batch floor for the join
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    val ev = graft.Tables.events(spark, dir)
      .select($"event_id", $"user_id", date_trunc("second", $"ts").as("ts"),
        $"event_type", $"value")
    val c = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("c_user"), $"ts".as("click_ts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user"),
        $"ts".as("purchase_ts"), $"value")
    val n = c.join(p, $"c_user" === $"p_user" && $"purchase_ts" >= $"click_ts" &&
      $"purchase_ts" <= $"click_ts" + expr("INTERVAL 600 SECONDS")).count()
    println(f"[profile] batch_join_floor      ${(System.nanoTime() - t0) / 1e9}%.2f ($n rows)")
    spark.stop()
  }
}
