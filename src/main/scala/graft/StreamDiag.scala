package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic for the streaming gates (not part of the query
  * surface): run one gate and print the engine's own per-batch
  * telemetry — batch id, input rows, the durationMs breakdown
  * (addBatch / getBatch / walCommit / commitOffsets / queryPlanning /
  * triggerExecution) and per-operator state-store commit times — so a
  * gate's wall time decomposes into engine phases instead of being
  * guessed at (guide §1: measure first; §7.1: the UI's SQL/metrics
  * surface, read programmatically since the bench runs UI-less).
  *
  * Usage: runMain graft.StreamDiag q106_stream_outer_join [dir] [cpus]
  */
object StreamDiag {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-diag")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B hatch: GRAFT_DIAG_CONF="k=v;k=v" applies arbitrary session
    // confs so knob experiments don't need a recompile each.
    val withConf = sys.env.get("GRAFT_DIAG_CONF").toSeq
      .flatMap(_.split(";")).filter(_.contains("="))
      .foldLeft(b) { (bb, kv) =>
        val Array(k, v) = kv.split("=", 2); bb.config(k, v) }
    val spark = withConf.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val warm = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t1) / 1e9
    println(f"[diag] $name warm=$warm%.3f s second=$sec%.3f s")
    for (p <- graft.streaming.StreamingGate.lastRunProgress.get()) {
      val dm = p.durationMs
      println(f"[diag] batch=${p.batchId} rows=${p.numInputRows} " +
        s"durationMs=$dm")
      for (so <- p.stateOperators)
        println(s"[diag]   state op=${so.operatorName} rowsTotal=${so.numRowsTotal} " +
          s"commitMs=${so.commitTimeMs} " +
          s"loadedProviders=${so.customMetrics.getOrDefault("loadedMapCacheHitCount", -1L)}")
    }
    spark.stop()
  }
}
