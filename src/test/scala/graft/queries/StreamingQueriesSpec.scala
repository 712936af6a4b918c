package graft.queries

import graft.SparkTestBase

/** The streaming gates (r52/r53) against their batch equivalents —
  * the same identity the driver's DuckDB oracle checks, pinned in the
  * suite so a streaming-path regression fails `sbt test` locally.
  */
class StreamingQueriesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("r52 streaming windowed rollup == batch GROUP BY on day/type") {
    assume(new java.io.File(dir).isDirectory)
    import org.apache.spark.sql.functions._
    val streamed = StreamingQueries.stream_window(spark, dir).collect()
    val batch = graft.Tables.load(spark, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sv"))
      .orderBy("day", "event_type").collect()
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("streaming reads normalize the legacy nanos-long ts layout " +
      "identically to Tables.load") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the pre-regeneration testdata layout: ts as nanos-since-epoch
    // longs — the streaming path must apply the same Tables.normalize
    // conversion, not just carry the batch loader's schema
    val dir = java.nio.file.Files.createTempDirectory("nanos_ev").toString
    val base = 1700000000000000L // micros
    (0 until 40).map { i =>
      (i.toLong, (base + i.toLong * 3600L * 1000000L) * 1000L,
        (i % 5).toLong, if (i % 2 == 0) "click" else "view",
        i.toDouble, """{"k":1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val streamed = StreamingQueries.stream_window(spark, dir).collect()
    val batch = graft.Tables.load(spark, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sv"))
      .orderBy("day", "event_type").collect()
    assert(streamed.nonEmpty && streamed.toSeq === batch.toSeq)
  }

  test("r54 stream-stream interval join == batch self-join") {
    assume(new java.io.File(dir).isDirectory)
    import org.apache.spark.sql.functions._
    val streamed = StreamingQueries.stream_join(spark, dir).collect()
    val ev = graft.Tables.load(spark, dir, "events")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val batch = c.join(p,
        c("user_id") === p("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 6 hours"))
      .select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts")
      .orderBy("user_id", "click_id", "purchase_id").collect()
    assert(streamed.nonEmpty && streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("r55 streaming sessionize == batch sessions under the emission contract") {
    assume(new java.io.File(dir).isDirectory)
    import org.apache.spark.sql.functions._
    val streamed = StreamingQueries.stream_sessionize(spark, dir).collect()
    // batch sessions (the r18 computation) + the streaming emission
    // contract: non-final sessions always emit; a final session emits
    // iff ms(end) + gap < ms(max_ts) - lateness (strict)
    val sess = RefQueries.sessionize(spark, dir)
    val ev = graft.Tables.load(spark, dir, "events")
    val wmMs = ev.agg(max(col("ts"))).head().getTimestamp(0).getTime - 600000L
    val batch = sess
      .withColumn("max_idx",
        max(col("session_idx")).over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")))
      .filter(col("session_idx") < col("max_idx") ||
        (floor(unix_micros(col("session_end")) / 1000) + 28800000L) <
          lit(wmMs))
      .select(col("user_id"),
        timestamp_millis(floor(unix_micros(col("session_start")) / 1000))
          .as("session_start"),
        timestamp_millis(floor(unix_micros(col("session_end")) / 1000))
          .as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start").collect()
    assert(streamed.nonEmpty && streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("r56 stream-static enrichment == batch dim join + rollup") {
    assume(new java.io.File(dir).isDirectory)
    import org.apache.spark.sql.functions._
    val streamed = StreamingQueries.stream_enrich(spark, dir).collect()
    val dim = graft.Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_nationkey"))
    val batch = graft.Tables.load(spark, dir, "events")
      .join(dim, Seq("user_id"))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("c_nationkey").cast("int").as("nation_key"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sv"))
      .orderBy("day", "nation_key").collect()
    assert(streamed.nonEmpty && streamed.toSeq === batch.toSeq)
  }

  test("r59 streaming decontamination == batch anti-join rollup") {
    assume(new java.io.File(dir).isDirectory)
    import org.apache.spark.sql.functions._
    val streamed = StreamingQueries.stream_decontam(spark, dir).collect()
    val docs = graft.Tables.load(spark, dir, "documents")
    val contaminated = docs.filter(col("doc_id") % 97 === 0)
      .select(md5(col("text")).as("h")).distinct()
    val batch = docs.withColumn("h", md5(col("text")))
      .join(contaminated, Seq("h"), "left_anti")
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        sum(col("doc_id")).cast("long").as("sum_ids"))
      .orderBy("source").collect()
    assert(streamed.nonEmpty && streamed.toSeq === batch.toSeq)
    // the eval set itself never survives: kept count < total docs
    assert(streamed.map(_.getLong(1)).sum < docs.count())
  }

  test("r60 streaming near-dup intake == batch d15 rollup") {
    assume(new java.io.File(dir).isDirectory)
    import org.apache.spark.sql.functions._
    val streamed = StreamingQueries.stream_neardup(spark, dir).collect()
    val batch = graft.queries.PipelineQueries
      .incremental_neardup(spark, dir)
      .groupBy(col("batch_id").as("doc_id"))
      .agg(count(lit(1)).as("n_dups"),
        sum(col("corpus_id")).cast("long").as("sum_ids"))
      .orderBy("doc_id").collect()
    assert(streamed.nonEmpty && streamed.toSeq === batch.toSeq)
  }

  test("r58 streaming cell ingestion == batch assignment rollup, " +
      "state one row per cell") {
    assume(new java.io.File(dir).isDirectory)
    import org.apache.spark.sql.functions._
    val streamed = StreamingQueries.stream_ann_ingest(spark, dir).collect()
    val centroids = PipelineQueries.centroidsFor(spark, dir)
    val batch = graft.operators.Similarity.assignCells(
        graft.Tables.load(spark, dir, "embeddings"), centroids)
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"), sum(col("vec_id")).as("sum_ids"),
        min(col("vec_id")).as("min_id"), max(col("vec_id")).as("max_id"))
      .select(col("cell").cast("int"), col("n_vecs"), col("sum_ids"),
        col("min_id"), col("max_id"))
      .orderBy("cell").collect()
    assert(streamed.nonEmpty && streamed.toSeq === batch.toSeq)
    // the index-directory contract: state rows == cells, not vectors
    val progs = StreamingQueries.progressByGate("r58")
      .filter(_.stateOperators.nonEmpty)
    assert(progs.nonEmpty)
    val finalRows = progs.last.stateOperators.map(_.numRowsTotal).sum
    assert(finalRows === batch.length.toLong,
      s"state rows $finalRows != cell count ${batch.length}")
  }

  test("r57 streaming top-k sketch == exact per-day batch top-5") {
    assume(new java.io.File(dir).isDirectory)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val streamed = StreamingQueries.stream_topk(spark, dir).collect()
    val batch = graft.Tables.load(spark, dir, "events")
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        get_json_object(col("props"), "$.k").as("item"))
      .groupBy("day", "item").agg(count(lit(1)).as("est"))
      .withColumn("rank", row_number().over(Window.partitionBy("day")
        .orderBy(col("est").desc, col("item").asc)).cast("int"))
      .filter(col("rank") <= 5)
      .select("day", "rank", "item", "est")
      .orderBy("day", "rank").collect()
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("r65 restart-resumed theta aggregation == the batch t22 matrix, " +
      "with each leg draining a strict subset of the corpus") {
    assume(new java.io.File(dir).isDirectory)
    val streamed = StreamingQueries.stream_theta_recovery(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val batch = PipelineQueries.source_overlap(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(streamed.toSeq === batch.toSeq,
      "post-restart sketch state diverged from the batch artifact")
    // the gate's own requires pin exactly-once; pin the restart SHAPE
    // here: both legs processed input, so the final matrix provably
    // crossed a checkpoint restart with live aggregation buffers
    val legs = Seq("r65_leg1", "r65_leg2").map(g =>
      StreamingQueries.progressByGate(g).map(_.numInputRows).sum)
    assert(legs.forall(_ > 0) && legs.sum == graft.Tables
      .load(spark, dir, "documents").count())
  }

  test("r66 streaming running-offset placement == batch p16 window, " +
      "carried across four ordered micro-batches") {
    assume(new java.io.File(dir).isDirectory)
    val streamed = StreamingQueries.stream_concat_chunk(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val batch = PipelineQueries.concat_chunk(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(streamed.toSeq === batch.toSeq,
      "incremental running-offset state diverged from the batch window")
    // the stream really ran multiple batches (state crossed commits)
    assert(StreamingQueries.progressByGate("r66")
      .count(_.numInputRows > 0) >= 4)
  }

  test("r67 restart-resumed GroupState placement == batch p16, each leg " +
      "a strict subset of the corpus") {
    assume(new java.io.File(dir).isDirectory)
    val streamed = StreamingQueries.stream_concat_chunk_recovery(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val batch = PipelineQueries.concat_chunk(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(streamed.toSeq === batch.toSeq,
      "resumed running-offset state diverged from the batch window — " +
        "leg 2 restarted offsets instead of continuing leg 1's")
    val legs = Seq("r67_leg1", "r67_leg2").map(g =>
      StreamingQueries.progressByGate(g).map(_.numInputRows).sum)
    val total = graft.Tables.load(spark, dir, "documents").count()
    assert(legs.forall(n => n > 0 && n < total) && legs.sum == total)
  }

  test("r53 streaming dedup collapses the doubled stream to one row per id") {
    assume(new java.io.File(dir).isDirectory)
    val got = StreamingQueries.stream_dedup(spark, dir)
    val events = graft.Tables.load(spark, dir, "events")
    assert(got.count() === events.count())
    // key uniqueness in the sink, not just the count
    assert(got.groupBy("event_id").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count() === 0L)
  }
}
