package graft.bench

import graft.GraftSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal (SCALE.md): blow the sf data up M× with structure
  * held constant and measure wall-time + shuffle volume, so the
  * "curves bend sub-quadratically" claims are measurements, not
  * design arguments.
  *
  * Mode `dedup` — d02 (MinHash+LSH) and p02 (candidate pairs →
  * connected components) over M salted copies of `documents`: copy k
  * offsets doc_id by k·10⁷ (windowed candidate generators never pair
  * across copies) and rewrites the text through a copy-specific
  * alphabet ROTATION — `translate(text, a..z, rot_k(a..z))` changes
  * essentially every 5-char shingle, so cross-copy similarity is ~0
  * and the corpus's near-dup DENSITY stays constant while N grows.
  * (Plain copies would instead add N·C(M,2) exact-dup pairs —
  * measuring the corpus's duplication blow-up, not the algorithm's
  * scaling.)
  *
  * Mode `graph` — the iterative graph engines: g04's 5-round PageRank
  * + residual over M salted copies of the consolidated events edge
  * list (BOTH endpoints offset by k·10⁷, so the blown-up graph is M
  * disjoint replicas of the same hub structure — degree distribution
  * and diameter constant while node/edge count grows), and g05's
  * degree-oriented triangle count over the same salted documents
  * corpus as the dedup mode (the similarity graph it closes into
  * triangles keeps constant density by the rotation argument above).
  *
  * Mode `ann` — the similarity path: s02's IVF probe over M salted
  * copies of `embeddings` under BOTH growth regimes (index grows with
  * the corpus → probe cost flat; index fixed → bucket size ∝ M,
  * scoring linear), plus d05's blocked near-dup pair join. Copies
  * circular-shift the vector (a coordinate rotation: norms and
  * intra-copy cosines bit-identical, cross-copy decorrelated).
  *
  * Mode `text` — the text-analysis path over the same salted corpus
  * as `dedup`: t07 (TF-IDF — tokenize → explode → doc-frequency join,
  * the shuffle-heavy member), t06 (vocab — global token aggregation)
  * and t04 (fingerprint — map-only contrast). The rotation changes
  * every token, so vocab SIZE grows ~linearly with M while per-doc
  * token counts stay constant — the adversarial direction for
  * dictionary-building operators.
  *
  * Mode `clean` — the corpus-cleaning path over the same salted
  * corpus: p06 boilerplate removal (constant boilerplate set →
  * broadcast side flat in M; reassembly shuffle linear), d08 URL
  * canonicalization dedup (constant canonical-group count, dups ∝ M
  * → partial aggregation must bound shuffle rows by partitions ×
  * groups, not input rows) and t11 PII scrub (map-only contrast).
  *
  * Mode `semantic` — d09's SemDeDup pair join (Σ cell²) under the two
  * cell-count regimes: fixed cells (pair work ∝ M², the anti-pattern)
  * vs cells raised ∝ M (linear, the deployment contract).
  *
  * Mode `passages` — d10 duplicate-passage detection (+ p07
  * temperature mixing) over the salted corpus: rotation keeps
  * duplicated-window density constant while window count grows ∝ M.
  *
  * Mode `streaming` — the streaming STATE path (r53 stateful dedup,
  * r55 sessionize, r57 sketch-in-state) on the RocksDB state store
  * over M salted copies of `events` (ids/users offset per copy, days
  * shared), reporting per-gate state rows/bytes from
  * `StreamingQueryProgress.stateOperators` — dedup/session state must
  * grow ∝ M while the per-day sketch state stays flat.
  *
  * Mode `deep` — the past-26 leg: d02 + s02 only, under the
  * permutation/sign-flip salts (see [[copyAlpha]] and
  * [[saltedEmbeddings]]), sized so M=100 is a single-digit-minute
  * run. Exists because the rotation/shift salts wrap at 26/64 copies
  * while the streaming mode's numeric-offset scheme reaches M=100 —
  * the batch curves need the same reach.
  *
  * Usage: runMain graft.bench.ScaleRehearsal <sfDir> <mult> [mode] [workDir]
  * (mode ∈ dedup|graph|ann|text|clean|semantic|passages|streaming|deep|edit,
  * default dedup)
  * Prints one JSON line: wall seconds + shuffle read/write MB per query.
  */
object ScaleRehearsal {

  /** Sums shuffle bytes across completed stages (driver-side listener —
    * metrics only, no data).
    */
  final class ShuffleMeter extends SparkListener {
    @volatile var read = 0L
    @volatile var written = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      read += sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
      written += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    }
  }

  /** Source-input meter — bytes/records actually READ from storage
    * across a leg's completed stages. This is where parquet row-group
    * skipping shows: a pushed point predicate over a key-clustered
    * layout decodes only the row groups whose min/max admit the key,
    * so recordsRead collapses while the scattered layout decodes
    * everything (`sortskip` mode).
    */
  final class InputMeter extends SparkListener {
    @volatile var bytes = 0L
    @volatile var records = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      bytes += sc.stageInfo.taskMetrics.inputMetrics.bytesRead
      records += sc.stageInfo.taskMetrics.inputMetrics.recordsRead
    }
  }

  /** Max single-task duration across a leg — the number that exposes
    * output-explosion skew (a hub's D² wedge expansion in ONE task),
    * which total wall-clock on a 32-thread box can hide and shuffle
    * BYTES cannot see at all (the skewed key's shuffle input is tiny).
    */
  private final class TaskMeter
      extends org.apache.spark.scheduler.SparkListener {
    @volatile var maxMs = 0L
    /** Max duration among tasks that READ a shuffle — the reducer
      * tasks, where a skewed window/agg key serializes. Separating
      * this from the global max stops scan/sink tasks from masking
      * the stage under test (the windowskew attribution fix).
      */
    @volatile var maxReduceMs = 0L
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val d = Option(te.taskInfo).map(_.duration).getOrElse(0L)
      if (d > maxMs) maxMs = d
      val sr = Option(te.taskMetrics)
        .map(_.shuffleReadMetrics.recordsRead).getOrElse(0L)
      if (sr > 0 && d > maxReduceMs) maxReduceMs = d
    }
  }

  private val alpha = "abcdefghijklmnopqrstuvwxyz"

  /** Copy-k alphabet image. k < 26: the ROTATION (unchanged, keeps
    * every published curve comparable). k ≥ 26: a seeded Fisher-Yates
    * PERMUTATION — rotations run out at 26 (copy 26 would clone copy
    * 0 exactly), but 26! permutations never do, so the corpus salting
    * extends to arbitrary M. Why not the streaming mode's
    * numeric-offset-only scheme here? Offsetting doc_id while sharing
    * TEXT makes every cross-copy pair an exact dup: d02's LSH buckets
    * then grow ∝ M and candidate pairs ∝ M² per original bucket —
    * measuring the corpus's duplication blow-up, not the algorithm
    * (the same trap as plain copies, see the class doc). Text legs
    * need a per-copy text BIJECTION; two seeded permutations map the
    * same 5-shingle to the same image only if they agree on all its
    * distinct letters (~26^-c for c distinct chars), so cross-copy
    * similarity stays ~0 at every M.
    */
  def copyAlpha(k: Int): String =
    if (k < 26) alpha.drop(k) + alpha.take(k)
    else {
      val arr = alpha.toCharArray
      val rnd = new scala.util.Random(k.toLong * 2654435761L)
      var i = arr.length - 1
      while (i > 0) {
        val j = rnd.nextInt(i + 1)
        val t = arr(i); arr(i) = arr(j); arr(j) = t
        i -= 1
      }
      new String(arr)
    }

  def saltedCorpus(spark: SparkSession, sfDir: String, mult: Int) = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (0 until mult).map { k =>
      docs.select(
        (col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"),
        translate(col("text"), alpha, copyAlpha(k)).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
  }

  /** Salted embeddings corpus: copy k offsets vec_id by k·10⁷ and
    * CIRCULAR-SHIFTS the vector by k positions — a rotation of the
    * coordinate axes, so every norm and every intra-copy cosine is
    * bit-identical to copy 0 while cross-copy vectors decorrelate
    * (plain copies would make every probe return M identical twins,
    * measuring duplication, not the index). Two label treatments map
    * to the two ways a real corpus grows:
    *  - `growIndex = true`: labels offset by k·1000 — the coarse
    *    quantizer grows WITH the corpus (nlist ∝ N, bucket size
    *    constant), the 100-TB deployment shape;
    *  - `growIndex = false`: labels shared — nlist fixed, bucket
    *    size ∝ N, the degenerate shape whose cost must be shown
    *    linear (not quadratic) before anyone trusts the index.
    */
  def saltedEmbeddings(spark: SparkSession, sfDir: String, mult: Int,
      growIndex: Boolean) = {
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    (0 until mult).map { k =>
      val dim = 64 // testdata embedding dim (TESTDATA.md)
      val shift = k % dim
      val shifted =
        if (shift == 0) col("embedding")
        else concat(
          slice(col("embedding"), shift + 1, dim - shift),
          slice(col("embedding"), 1, shift))
      // Shifts run out at dim=64 (copy 64 would clone copy 0); past
      // that, compose a seeded per-copy SIGN FLIP — a diagonal ±1
      // matrix, still orthogonal, so every norm and every intra-copy
      // cosine stays bit-identical while copies k and k+64 decorrelate
      // (their coordinate-wise sign patterns agree with prob 2^-64).
      // The signed-permutation group (2^64·64 elements just for
      // shift∘flip) never wraps at any M this harness will see.
      val vec =
        if (k < dim) shifted
        else {
          val rnd = new scala.util.Random(k.toLong * 1099511628211L)
          val signs = Array.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
          zip_with(shifted, lit(signs), (x, s) => x * s)
        }
      base.select(
        (col("vec_id") + lit(k.toLong * 10000000L)).as("vec_id"),
        vec.as("embedding"),
        (if (growIndex) col("label") + lit(k * 1000) else col("label"))
          .as("label"))
    }.reduce(_ unionAll _)
  }

  /** M disjoint replicas of the g04 edge list: both endpoints offset
    * per copy, so every copy is the same hub graph and the union's
    * degree distribution is independent of M.
    */
  /** M disjoint copies of the events table by NUMERIC id offsets —
    * event_id and user_id shifted k·10⁷ per copy, ts/props/types
    * SHARED — written to `dest`; returns the row count. One
    * definition for the four modes that salt events this way
    * (streaming/refsurface/bucketjoin — a salt-scheme change must
    * never need four coordinated edits; review finding).
    */
  def offsetSaltedEvents(spark: SparkSession, sfDir: String, mult: Int,
      dest: String): Long = {
    val base = spark.read.parquet(s"$sfDir/events.parquet")
    (0 until mult).map { k =>
      val off = lit(k.toLong * 10000000L)
      base.select((col("event_id") + off).as("event_id"), col("ts"),
        (col("user_id") + off).as("user_id"), col("event_type"),
        col("value"), col("props"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dest/events.parquet")
    spark.read.parquet(s"$dest/events.parquet").count()
  }

  /** The documents-table variant of [[offsetSaltedEvents]] (doc_id
    * offset, text shared — for legs whose cost is content-independent;
    * text-sensitive legs use [[saltedCorpus]]'s alphabet bijection).
    */
  def offsetSaltedDocs(spark: SparkSession, sfDir: String, mult: Int,
      dest: String): Long = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    (0 until mult).map { k =>
      val off = lit(k.toLong * 10000000L)
      base.select((col("doc_id") + off).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dest/documents.parquet")
    spark.read.parquet(s"$dest/documents.parquet").count()
  }

  def saltedEdges(spark: SparkSession, sfDir: String, mult: Int) = {
    val base = graft.graph.GraphProjection.consolidate(
        graft.Tables.load(spark, sfDir, "events")
          .withColumn("src", col("user_id"))
          .withColumn("dst",
            get_json_object(col("props"), "$.k").cast("int").cast("long") % 10),
        Seq("src", "dst"), col("ts"), Seq("event_type"))
      .select("src", "dst")
    (0 until mult).map { k =>
      val off = lit(k.toLong * 10000000L)
      base.select((col("src") + off).as("src"), (col("dst") + off).as("dst"))
    }.reduce(_ unionAll _)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mult = args(1).toInt
    val mode = args.lift(2).getOrElse("dedup")
    // Historic cap rationale: only 26 distinct alphabet rotations
    // exist, and corpus copy 26 would have been an EXACT clone of
    // copy 0, re-introducing the cross-copy dup blow-up the salting
    // avoids (measured: M=30 tripled d02's pair count via the 4
    // wrapped copies). copyAlpha now switches to seeded PERMUTATIONS
    // past k=25 (and saltedEmbeddings to sign flips past k=63), so
    // the `deep` mode — the lean d02+s02 subset sized for M=100 — and
    // `streaming` (numeric id offsets, no wrap below M=1000) may go
    // far past 26. The full batch modes keep the 26 cap purely as a
    // wall-clock/disk guard: they run 4-6 legs per M and their
    // sub-26 curves already pin the linearity reading.
    val maxMult =
      if (mode == "streaming" || mode == "deep" || mode == "annfilter") 1000
      else if (mode == "edit" || mode == "windowskew" ||
        mode == "refsurface" || mode == "maintain" ||
        mode == "bucketjoin" || mode == "sortskip" ||
        mode == "chsurface" || mode == "zorderskip" ||
        mode == "mergetree" || mode == "projection") 100
      else 26
    require(mult >= 1 && mult <= maxMult,
      s"mult must be in [1, $maxMult] for mode $mode")
    require(Seq("dedup", "graph", "ann", "text", "clean", "semantic",
      "passages", "streaming", "deep", "edit", "annfilter", "windowskew",
      "bpek", "refsurface", "maintain", "bucketjoin",
      "sortskip", "chsurface", "zorderskip", "mergetree",
      "projection").contains(mode),
      s"unknown mode $mode")
    val work = if (args.length > 3) args(3)
      else {
        val d = java.nio.file.Files.createTempDirectory("graft_scale")
        // remove this run's work dir at exit, and sweep siblings a
        // SIGKILLed run left behind (same aging policy as the
        // streaming scratch dirs — salted corpora are GBs at M=26,
        // and before this sweep every rehearsal run leaked one)
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          org.apache.commons.io.FileUtils.deleteQuietly(d.toFile)))
        Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty)
          // ONLY the graft_scale prefix: the legacy `scale\d+` pattern
          // matched Files.createTempDirectory("scale") names from ANY
          // process, so the sweep could delete unrelated /tmp dirs
          .filter(f => f.getName.startsWith("graft_scale") &&
            f.getPath != d.toString &&
            f.lastModified < System.currentTimeMillis - 6L * 3600 * 1000)
          .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
        d.toString
      }
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    def time(fn: => Long): (Double, Double, Double, Long) = {
      val (r0, w0) = (meter.read, meter.written)
      val t0 = System.nanoTime()
      val rows = fn
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; flush the bus before
      // reading the meter so no in-flight task-end event is missed
      org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext)
      ((sec * 100).round / 100.0,
        ((meter.read - r0) / 1e6 * 10).round / 10.0,
        ((meter.written - w0) / 1e6 * 10).round / 10.0, rows)
    }
    def jq(t: (Double, Double, Double, Long)): String =
      s"""{"sec":${t._1},"shuffle_read_mb":${t._2},""" +
        s""""shuffle_write_mb":${t._3},"rows":${t._4}}"""
    // Shared full-column hash sink (ONE definition — the round-14
    // expectRows fix and the round-15 empty-result guard both landed
    // as per-mode copies before this was hoisted; a sink fix must
    // never need applying in four places again). Forces full
    // evaluation of EVERY output column — count() alone prunes
    // cardinality-preserving windows/aggregates, the StageProbe trap
    // — and returns an order-insensitive result hash so two legs can
    // be asserted identical.
    def hashSink(df: org.apache.spark.sql.DataFrame, label: String,
        expectRows: Boolean = true): Long = {
      val cols = df.columns.sorted
        .map(c => coalesce(col(c).cast("string"), lit("")))
      val r = df.select(xxhash64(
          concat_ws("\u0001", cols.toIndexedSeq: _*)).as("h"))
        .agg(count(lit(1)).as("n"),
          sum(col("h").cast("decimal(38,0)")).as("hs")).first()
      // zero rows ⇒ sum is NULL; fail with the intended message, not
      // an opaque NPE from getDecimal (round-14 ADVICE)
      require(!expectRows || r.getLong(0) > 0,
        s"$label sink: leg produced ZERO rows — empty-result bug")
      if (r.getLong(0) == 0L) 0L
      else r.getDecimal(1).longValue() ^ r.getLong(0)
    }
    // Shared max-task meter wrapper: runs a leg under a TaskMeter and
    // returns (time-tuple, max task ms, max shuffle-reading task ms).
    def meterLeg(fn: => Long)
        : ((Double, Double, Double, Long), Long, Long) = {
      val tm = new TaskMeter
      spark.sparkContext.addSparkListener(tm)
      val r = time(fn)
      org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext)
      spark.sparkContext.removeSparkListener(tm)
      (r, tm.maxMs, tm.maxReduceMs)
    }

    if (mode == "deep") {
      // The M=100 leg (VERDICT r11 #3): the rotation cap confined
      // every batch family to 26× while streaming went to 100× — this
      // mode runs ONE dedup leg (d02, the MinHash+LSH member whose
      // pair-density argument the permutation salt must uphold) and
      // ONE ANN leg (s02, both index regimes) at the permutation /
      // sign-flip salts, so the batch linearity curves get their
      // M=100 points without paying for the full 4-6 leg modes.
      saltedCorpus(spark, sfDir, mult).write.mode("overwrite")
        .parquet(s"$work/documents.parquet")
      val nDocs = spark.read.parquet(s"$work/documents.parquet").count()
      // d02's "rows" field doubles as the salt's honesty check: if
      // permutation copies collided (shingle images agreeing across
      // copies), the verified-pair count would bend super-linear in M
      // exactly like the wrapped-rotation M=30 incident.
      val d02 = time(
        graft.queries.PipelineQueries.minhash_lsh_dedup(spark, work).count())
      saltedEmbeddings(spark, sfDir, mult, growIndex = true)
        .write.mode("overwrite").parquet(s"$work/replica/embeddings.parquet")
      saltedEmbeddings(spark, sfDir, mult, growIndex = false)
        .write.mode("overwrite").parquet(s"$work/grown/embeddings.parquet")
      val nVecs = spark.read
        .parquet(s"$work/replica/embeddings.parquet").count()
      val s02Replica = time(
        graft.queries.PipelineQueries.ann_ivf(spark, s"$work/replica").count())
      val s02Grown = time(
        graft.queries.PipelineQueries.ann_ivf(spark, s"$work/grown").count())
      println(s"""{"mult":$mult,"docs":$nDocs,"vectors":$nVecs,""" +
        s""""d02":${jq(d02)},""" +
        s""""s02_replica":${jq(s02Replica)},""" +
        s""""s02_grown":${jq(s02Grown)}}""")
    } else if (mode == "windowskew") {
      // The per-group-window skew leg (VERDICT r13 #2): p03/p16/p17
      // all run a window PARTITIONED by a fixed low-cardinality group
      // key (lang/source), so one 90%-dominant group serializes the
      // whole window in ONE reducer task at scale. This leg builds
      // that adversarial corpus (90% of rows forced into one lang)
      // and measures MAX-TASK time for the single-level form vs the
      // two-level bucketed form (rank/prefix-sum within (group,
      // bucket) + broadcast per-bucket offsets), for BOTH family
      // shapes: the p16 running-sum (bucket = contiguous doc_id
      // block, a prefix of the doc_id sort order) and the p17
      // md5-ordered rank (bucket = md5 prefix). Outputs are asserted
      // EQUAL between forms (hash of every column), so the leg is
      // also the order-equivalence proof at rehearsal scale.
      import org.apache.spark.sql.expressions.Window
      saltedCorpus(spark, sfDir, mult)
        .withColumn("lang",
          when(pmod(col("doc_id"), lit(10)) =!= 0, lit("en"))
            .otherwise(concat(lit("l"), pmod(col("doc_id"), lit(97)))))
        .write.mode("overwrite").parquet(s"$work/documents.parquet")
      val t = spark.read.parquet(s"$work/documents.parquet")
        .select(col("lang"), col("doc_id"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long").as("n_tokens"))
        .filter(col("n_tokens") > 0)
        .persist()
      val nDocs = t.count()
      def sink(df: org.apache.spark.sql.DataFrame): Long =
        hashSink(df, "windowskew")
      // ---- p16 family: per-group running prefix sum ----
      val wSingle = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      def sumSingle = t.withColumn("start_off",
        sum("n_tokens").over(wSingle) - col("n_tokens"))
      // two-level: bucket = contiguous doc_id block (copies sit 10^7
      // apart, so div 10^6 blocks are copy-aligned); (bkt, doc_id)
      // order ≡ doc_id order because the bucket is monotone in doc_id
      val keyedS = t.withColumn("bkt", expr("doc_id div 1000000"))
      def offS = keyedS.groupBy("lang", "bkt")
        .agg(sum("n_tokens").as("tok"))
        .withColumn("off", coalesce(
          sum("tok").over(Window.partitionBy("lang").orderBy("bkt")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("lang", "bkt", "off")
      def sumTwo = keyedS.join(broadcast(offS), Seq("lang", "bkt"))
        .withColumn("start_off",
          sum("n_tokens").over(Window.partitionBy("lang", "bkt")
              .orderBy("doc_id")
              .rowsBetween(Window.unboundedPreceding, 0))
            + col("off") - col("n_tokens"))
        .select("lang", "doc_id", "n_tokens", "start_off")
      // ---- p17 family: per-group md5-ordered rank ----
      def rankSingle = t.withColumn("r", row_number().over(
        Window.partitionBy("lang")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
        .cast("long")).select("lang", "doc_id", "r")
      val keyedR = t
        .withColumn("mk", md5(col("doc_id").cast("string")))
        .withColumn("bkt", substring(col("mk"), 1, 2))
      def offR = keyedR.groupBy("lang", "bkt").agg(count(lit(1)).as("c"))
        .withColumn("off", coalesce(
          sum("c").over(Window.partitionBy("lang").orderBy("bkt")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("lang", "bkt", "off")
      def rankTwo = keyedR.join(broadcast(offR), Seq("lang", "bkt"))
        .withColumn("r", row_number().over(
          Window.partitionBy("lang", "bkt").orderBy("mk", "doc_id"))
          .cast("long") + col("off"))
        .select("lang", "doc_id", "r")
      var h1 = 0L; var h2 = 0L
      val s1 = meterLeg { h1 = sink(sumSingle
        .select("lang", "doc_id", "n_tokens", "start_off")); nDocs }
      val s2 = meterLeg { h2 = sink(sumTwo); nDocs }
      require(h1 == h2,
        s"windowskew: two-level prefix-sum diverged (hash $h1 vs $h2)")
      var r1 = 0L; var r2 = 0L
      val g1 = meterLeg { r1 = sink(rankSingle); nDocs }
      val g2 = meterLeg { r2 = sink(rankTwo); nDocs }
      require(r1 == r2,
        s"windowskew: two-level rank diverged (hash $r1 vs $r2)")
      t.unpersist()
      println(s"""{"mult":$mult,"docs":$nDocs,""" +
        s""""sum_single":${jq(s1._1)},"sum_single_max_task_ms":${s1._2},""" +
        s""""sum_single_max_reduce_ms":${s1._3},""" +
        s""""sum_two":${jq(s2._1)},"sum_two_max_task_ms":${s2._2},""" +
        s""""sum_two_max_reduce_ms":${s2._3},""" +
        s""""rank_single":${jq(g1._1)},"rank_single_max_task_ms":${g1._2},""" +
        s""""rank_single_max_reduce_ms":${g1._3},""" +
        s""""rank_two":${jq(g2._1)},"rank_two_max_task_ms":${g2._2},""" +
        s""""rank_two_max_reduce_ms":${g2._3}}""")
    } else if (mode == "refsurface") {
      // The reference's OWN workload at M (VERDICT r14 #2): every
      // pipeline family has a measured curve but the queries the
      // reference actually serves (README.md:88-129) had none. Salt
      // `events` with the streaming mode's numeric-offset scheme —
      // event_id AND user_id offset by k·10⁷ per copy, ts/props/types
      // SHARED — so each leg's scale story separates:
      //  - r06 activity (the 4-subquery LEFT-JOIN composition, here
      //    the one-pass count_if pivot): (user, k) groups ∝ M with
      //    per-group size constant → agg shuffle rows ∝ M, and the
      //    global top-20 is a TakeOrdered merge, never a global sort;
      //  - r07 status anti-join: hour buckets are SHARED across
      //    copies, so both distinct-hour sides stay FLAT (~720 rows)
      //    while the scanned input grows ∝ M — partial aggregation
      //    must bound the shuffle by partitions × hours, not rows;
      //  - r09 Replacing dedup (aggregate form): keys
      //    (user, type, month) ∝ M with constant group size — the
      //    map-side-combine form's shuffle must grow ∝ keys, and no
      //    reducer materializes a whole key group (the window form
      //    would).
      // Results are forced through the shared full-column hash
      // sink (count() alone prunes cardinality-preserving aggregates)
      // and metered for max-task / max-reduce-task time, the skew
      // evidence wall-clock on 32 threads hides.
      val nEvents = offsetSaltedEvents(spark, sfDir, mult, work)
      // expectRows=false for r07: at denser SFs every hour holds an
      // error event, so the anti-join's EMPTY result is the correct
      // answer, not a bug — the leg still pays the full scan + both
      // distinct aggregations it exists to measure
      def sink(df: org.apache.spark.sql.DataFrame,
          expectRows: Boolean = true): Long =
        hashSink(df, "refsurface", expectRows)
      import graft.queries.RefQueries
      val r06 = meterLeg { sink(RefQueries.activity(spark, work)); nEvents }
      val r07 = meterLeg {
        sink(RefQueries.status_anti_join(spark, work),
          expectRows = false); nEvents }
      val r09 = meterLeg {
        sink(RefQueries.dedup_replacing(spark, work)); nEvents }
      println(s"""{"mult":$mult,"events":$nEvents,""" +
        s""""r06_activity":${jq(r06._1)},""" +
        s""""r06_max_task_ms":${r06._2},"r06_max_reduce_ms":${r06._3},""" +
        s""""r07_anti_join":${jq(r07._1)},""" +
        s""""r07_max_task_ms":${r07._2},"r07_max_reduce_ms":${r07._3},""" +
        s""""r09_replacing_dedup":${jq(r09._1)},""" +
        s""""r09_max_task_ms":${r09._2},"r09_max_reduce_ms":${r09._3}}""")
    } else if (mode == "chsurface") {
      // The CH-compat STATEMENT surface at M (round-15 VERDICT #7):
      // refsurface gave r06/r07/r09 their curves; the remaining
      // reference-user paths with no measured M-curve were r35's
      // `FROM t FINAL` read and r47's ALTER-mutation partition
      // rewrite. Same numeric-offset event salt as refsurface
      // (event_id/user_id offset per copy, types/ts shared).
      //  - r35 FINAL: read-time Replacing dedup over the registered
      //    (user_id, event_type) key — keys ∝ M with constant group
      //    size, so the dedup shuffle must grow ∝ keys and no reducer
      //    materializes a whole key group (r09's argument replayed on
      //    the READ path, where ClickHouse pays it at merge time).
      //  - r47 mutations: DELETE drops the whole 'error' partition,
      //    UPDATE rewrites only 'purchase' — copy-on-write cost must
      //    scale with the TOUCHED partitions' bytes only, and the
      //    untouched partitions' data files must come through BYTE-
      //    IDENTICAL (md5 of every file before/after — the ClickHouse
      //    parts-not-touched contract, checked physically, not
      //    inferred from the plan).
      val nEvents = offsetSaltedEvents(spark, sfDir, mult, work)
      def sink(df: org.apache.spark.sql.DataFrame): Long =
        hashSink(df, "chsurface")
      import graft.queries.RefQueries
      var h35 = 0L
      val r35 = meterLeg {
        h35 = sink(RefQueries.ch_final(spark, work)); nEvents }
      // bucketed FINAL contrast (round-16 VERDICT #6): the SAME FINAL
      // statement over the bucketBy(32, user_id) catalog copy of the
      // salted events — the r71 discipline measured where the driver's
      // scale evidence lives. The write paid the user_id exchange
      // once; the read-side dedup window's distribution is satisfied
      // by the bucket spec, so its shuffle must be ZERO BYTES at every
      // M (vs the key-bounded r35 shuffle above, which grows ∝ keys).
      // The bucketed root is per-work-dir and the salt differs per M,
      // so the copy is rebuilt (untimed — the measured leg is the
      // READ) after clearing any stale files + memo from a prior mult.
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(RefQueries.bucketedEventsPath(work)))
      RefQueries.clearBucketedMemo()
      sink(RefQueries.ch_final_bucketed(spark, work))
      var h35b = 0L
      val r35b = meterLeg {
        h35b = sink(RefQueries.ch_final_bucketed(spark, work)); nEvents }
      require(h35 == h35b,
        s"chsurface: bucketed FINAL diverged from the plain read " +
          s"(hash $h35 vs $h35b) — layout changed answers")
      val loc = s"$work/mut"
      spark.sql("DROP TABLE IF EXISTS events_mut_scale")
      spark.sql(s"""CREATE TABLE events_mut_scale
        (event_id BIGINT, user_id BIGINT, value DOUBLE, event_type STRING)
        USING parquet PARTITIONED BY (event_type) LOCATION '$loc'""")
      graft.Tables.load(spark, work, "events")
        .select("event_id", "user_id", "value", "event_type")
        .write.mode("append").insertInto("events_mut_scale")
      // snapshot every data file of the partitions the mutations must
      // NOT touch (everything but error/purchase)
      def fileMd5s(): Map[String, String] = {
        val root = new java.io.File(loc)
        Option(root.listFiles).getOrElse(Array.empty)
          .filter(d => d.isDirectory &&
            d.getName.startsWith("event_type=") &&
            d.getName != "event_type=error" &&
            d.getName != "event_type=purchase")
          .flatMap(d => Option(d.listFiles).getOrElse(Array.empty)
            .filter(_.getName.endsWith(".parquet")))
          .map { f =>
            val h = java.security.MessageDigest.getInstance("MD5")
              .digest(java.nio.file.Files.readAllBytes(f.toPath))
            f.getAbsolutePath -> h.map("%02x".format(_)).mkString
          }.toMap
      }
      val before = fileMd5s()
      require(before.nonEmpty,
        "chsurface: no untouched-partition files to fingerprint")
      var delParts = 0; var updParts = 0
      val del = meterLeg {
        delParts = graft.functions.ChMutations.mutate(spark,
          "ALTER TABLE events_mut_scale DELETE WHERE event_type = 'error'")
        nEvents }
      val upd = meterLeg {
        updParts = graft.functions.ChMutations.mutate(spark,
          "ALTER TABLE events_mut_scale UPDATE value = value * 2 " +
            "WHERE event_type = 'purchase' AND value > 50")
        nEvents }
      val after = fileMd5s()
      require(before == after,
        s"chsurface: untouched partitions' files changed across the " +
          s"mutations (${before.size} before vs ${after.size} after) — " +
          "the partition-pruned rewrite touched more than it claimed")
      // the mutated table still answers (and the read is charged the
      // post-mutation layout): per-type counts + exact value mass
      val post = meterLeg {
        sink(spark.table("events_mut_scale").groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(20,4)")).as("sv")))
        nEvents }
      spark.sql("DROP TABLE IF EXISTS events_mut_scale")
      println(s"""{"mult":$mult,"events":$nEvents,""" +
        s""""r35_final":${jq(r35._1)},""" +
        s""""r35_max_task_ms":${r35._2},"r35_max_reduce_ms":${r35._3},""" +
        s""""r35_final_bucketed":${jq(r35b._1)},""" +
        s""""r35b_max_task_ms":${r35b._2},""" +
        s""""r35b_max_reduce_ms":${r35b._3},"final_hash_equal":true,""" +
        s""""mut_delete":${jq(del._1)},"mut_delete_parts":$delParts,""" +
        s""""mut_delete_max_task_ms":${del._2},""" +
        s""""mut_update":${jq(upd._1)},"mut_update_parts":$updParts,""" +
        s""""mut_update_max_task_ms":${upd._2},""" +
        s""""untouched_files":${before.size},"untouched_identical":true,""" +
        s""""post_read":${jq(post._1)}}""")
    } else if (mode == "maintain") {
      // The round-15 maintenance/training legs: p20 compaction and
      // t27 batch-perceptron training at M× the base corpus (numeric
      // doc_id offsets, text SHARED — neither operator's cost depends
      // on content overlap, so the cheap salt is the right one).
      //  - p20: the plan stage is FILE-grain (64 files × langs —
      //    metadata-scale regardless of M, since the operator's
      //    simulated ingest scatter is doc_id mod 64 and 10⁷ ≡ 0
      //    mod 64 keeps every copy in the same files); bins and
      //    rewrite bytes grow ∝ M. The claim under test: wall and
      //    shuffle LINEAR in M, no single reduce task hoarding the
      //    rewrite (bins hash-spread across the exchange).
      //  - t27: the feature table grows ∝ M while the weight vector
      //    stays 33 rows; each epoch is a broadcast score join + a
      //    doc-grain semi-join. The claim: wall/shuffle LINEAR in M,
      //    per-epoch collect constant.
      // Both legs run the GATE bodies verbatim (build included) and
      // force full-column hashes through the refsurface sink.
      val nDocs = offsetSaltedDocs(spark, sfDir, mult, work)
      def sink(df: org.apache.spark.sql.DataFrame): Long =
        hashSink(df, "maintain")
      import graft.queries.PipelineQueries
      // feature-DIMENSION sweep first: train at B = 32 / 1024 / 16384
      // hashed buckets on the same salted corpus — the per-epoch cost
      // is dominated by the feature table (independent of B), so the
      // trainer wall must stay ~flat while the collected weight
      // artifact grows only as min(B, distinct buckets touched). The
      // memo is cleared after, so the gate legs below still time the
      // FULL train+score body at the gate's own B=32.
      val bSweep = Seq(32, 1024, 16384).map { b =>
        val t0 = System.nanoTime()
        val w = PipelineQueries.t27TrainedWeights(spark, work, b)
        val sec = ((System.nanoTime() - t0) / 1e7).round / 100.0
        // report buckets actually TOUCHED (non-zero weight), not the
        // Array.fill(B+1) length — the length is B+1 by construction
        // and measured nothing (round-15 ADVICE); the nonzero count
        // is the evidence that the artifact grows as
        // min(B, distinct buckets touched)
        s""""b$b":{"train_sec":$sec,"weights_nonzero":${w.count(_ != 0L)}}"""
      }
      PipelineQueries.clearT27Memo()
      val p20 = meterLeg {
        sink(PipelineQueries.compaction_manifest(spark, work)); nDocs }
      val binDirList = Option(new java.io.File(
          PipelineQueries.p20CompactPath(work)).listFiles)
        .getOrElse(Array.empty)
        .filter(_.getName.startsWith("lang="))
        .flatMap(f => Option(f.listFiles).getOrElse(Array.empty))
        .filter(_.getName.startsWith("bin="))
      // the physical contract at SCALE, not just in the planted spec:
      // the rewrite must leave exactly ONE data file per bin at every M
      binDirList.foreach { d =>
        val parts = d.listFiles.count(f =>
          f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        require(parts == 1,
          s"maintain: bin dir $d holds $parts files — compaction " +
            "must produce exactly one")
      }
      val binDirs = binDirList.length
      // p21, the merge+split sibling, at the same M (round 16): the
      // interesting curve is the split side — the fat file's piece
      // count grows ∝ M at the fixed 8 KiB test target, and past
      // M≈30 every "small" file also crosses the 32 KiB threshold,
      // so the leg walks the mixed regime into the pure-split regime.
      // Output-bin count ∝ M is the operator doing its job (the
      // target is the dial — 8 KiB here, ~1 GB in production); the
      // claim under test is that the PLAN cost stays file/piece-
      // grain (max reduce bounded, shuffle ∝ M) while the sink pays
      // the file-count cost the chosen target implies.
      val p21 = meterLeg {
        sink(PipelineQueries.compaction_split_manifest(spark, work))
        nDocs }
      val p21Dirs = Option(new java.io.File(
          PipelineQueries.p21CompactPath(work)).listFiles)
        .getOrElse(Array.empty)
        .filter(_.getName.startsWith("lang="))
        .flatMap(f => Option(f.listFiles).getOrElse(Array.empty))
        .filter(_.getName.startsWith("bin="))
      p21Dirs.foreach { d =>
        val parts = d.listFiles.count(f =>
          f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        require(parts == 1,
          s"maintain: p21 bin dir $d holds $parts files — compaction " +
            "must produce exactly one")
      }
      val p21Split = p21Dirs.count(
        _.getName.stripPrefix("bin=").toLong >= 1000000L)
      val t27 = meterLeg {
        sink(PipelineQueries.perceptron_quality(spark, work)); nDocs }
      // t29 AFTER t27 — the composed-pipeline shape the gate models
      // (train once, gate the corpus): the scoring pass reuses the
      // cached feature table and memoized weights, so this leg times
      // the INCREMENTAL cost of gating + packing at M
      val t29 = meterLeg {
        sink(PipelineQueries.classifier_gated_corpus(spark, work))
        nDocs }
      // the M×-sized rewrite artifacts are leg scratch, not gate
      // artifacts anyone probes — drop them with the work dir
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(PipelineQueries.p20CompactPath(work)))
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(PipelineQueries.p21CompactPath(work)))
      println(s"""{"mult":$mult,"docs":$nDocs,""" +
        s""""p20_compaction":${jq(p20._1)},""" +
        s""""p20_max_task_ms":${p20._2},"p20_max_reduce_ms":${p20._3},""" +
        s""""p20_bins":$binDirs,""" +
        s""""p21_compact_split":${jq(p21._1)},""" +
        s""""p21_max_task_ms":${p21._2},"p21_max_reduce_ms":${p21._3},""" +
        s""""p21_bins":${p21Dirs.length},"p21_split_bins":$p21Split,""" +
        s""""t27_perceptron":${jq(t27._1)},""" +
        s""""t27_max_task_ms":${t27._2},"t27_max_reduce_ms":${t27._3},""" +
        s""""t29_classifier_gate":${jq(t29._1)},""" +
        s""""t29_max_task_ms":${t29._2},"t29_max_reduce_ms":${t29._3},""" +
        bSweep.mkString(",") + "}")
    } else if (mode == "bucketjoin") {
      // Bucketed co-location at M (BucketedLayoutSpec's capability,
      // measured): the same user-grain equi-join paid two ways — from
      // tables written `bucketBy(32, user_id)` (shuffle must be ~ZERO
      // at every M: the exchange moved to write time, paid once) and
      // from plain parquet (shuffle grows ∝ M: paid on every query).
      // The one-time write cost is reported alongside so the trade is
      // visible, not implied. Broadcast disabled for the legs — at
      // 100 TB neither side of a fact-to-fact join broadcasts.
      val nEvents = offsetSaltedEvents(spark, sfDir, mult, work)
      val ev = spark.read.parquet(s"$work/events.parquet")
      def sink(df: org.apache.spark.sql.DataFrame): Long =
        hashSink(df, "bucketjoin")
      spark.sql("DROP TABLE IF EXISTS bj_events")
      spark.sql("DROP TABLE IF EXISTS bj_users")
      val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        // repartition by the bucket key BEFORE the bucketed write —
        // without it Spark's v1 bucketing writes (tasks × buckets)
        // files (every task splits its rows into per-bucket files:
        // the small-file problem p20 exists to fix); with it the
        // table lands as ONE file per bucket and the write leg pays
        // the one-time exchange the query legs then never pay
        val tWrite = time {
          ev.repartition(32, col("user_id"))
            .write.bucketBy(32, "user_id").sortBy("user_id")
            .mode("overwrite").saveAsTable("bj_events")
          ev.groupBy("user_id")
            .agg(count(lit(1)).as("n_events"), max("value").as("max_v"))
            .repartition(32, col("user_id"))
            .write.bucketBy(32, "user_id").sortBy("user_id")
            .mode("overwrite").saveAsTable("bj_users")
          nEvents
        }
        // the plain leg's dim side is ALSO precomputed (parquet, not
        // an inline aggregate) so both legs time the same logical
        // work — a JOIN of two stored tables — and differ only in
        // layout; an inline aggregate on the plain side would charge
        // it the agg's shuffle too and flatter the bucketed leg
        ev.groupBy("user_id")
          .agg(count(lit(1)).as("n_events"), max("value").as("max_v"))
          .write.mode("overwrite").parquet(s"$work/users.parquet")
        def legJoin(l: org.apache.spark.sql.DataFrame,
            r: org.apache.spark.sql.DataFrame) =
          sink(l.join(r, Seq("user_id"))
            .select(col("user_id"), col("event_type"), col("n_events")))
        // the join legs return the result HASH; `rows` in their jq
        // output stays the event count (hash in a count field broke
        // the field's semantics — review finding), and the equality
        // is ASSERTED here, not left for a reader to eyeball
        var hBucketed = 0L; var hPlain = 0L
        val bucketed = time {
          hBucketed = legJoin(spark.table("bj_events"),
            spark.table("bj_users")); nEvents }
        val plain = time {
          hPlain = legJoin(ev,
            spark.read.parquet(s"$work/users.parquet"))
          nEvents }
        require(hBucketed == hPlain,
          s"bucketjoin: co-located join result diverged from the " +
            s"shuffled join (hash $hBucketed vs $hPlain)")
        println(s"""{"mult":$mult,"events":$nEvents,""" +
          s""""bucketed_write":${jq(tWrite)},""" +
          s""""bucketed_join":${jq(bucketed)},""" +
          s""""plain_join":${jq(plain)},""" +
          s""""result_hash_equal":true}""")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
        spark.sql("DROP TABLE IF EXISTS bj_events")
        spark.sql("DROP TABLE IF EXISTS bj_users")
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File("spark-warehouse/bj_events"))
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File("spark-warehouse/bj_users"))
      }
    } else if (mode == "sortskip") {
      // The THIRD write-layout lever, measured (bucketing and
      // compaction have their legs above): in-partition SORT by the
      // query key turns parquet row-group min/max stats into a sparse
      // index — the Spark-side equivalent of ClickHouse's primary-key
      // index skip (SURVEY §4 row 2), which EventsWriterSpec pins as
      // a write-side sortedness property but nothing measured on the
      // READ side. Same salted events, two layouts, same pushed point
      // predicate: the clustered layout decodes only the row groups
      // whose stats admit the key; the scattered layout decodes every
      // row group. The skip shows in the scan's input records/bytes
      // (InputMeter), not wall on a page-cached box.
      val nEvents = offsetSaltedEvents(spark, sfDir, mult, work)
      val ev = spark.read.parquet(s"$work/events.parquet")
      ev.repartitionByRange(32, col("user_id"))
        .sortWithinPartitions("user_id")
        .write.mode("overwrite").parquet(s"$work/sorted/events.parquet")
      ev.repartition(32)
        .write.mode("overwrite").parquet(s"$work/scattered/events.parquet")
      // probe key drawn from the EXISTING key set (round-15 ADVICE:
      // `min + 37` assumed ≥38 dense ids — at sf0.001's 15 users it
      // matched zero rows and both legs hashed an empty aggregate,
      // silently voiding the row-group-skip measurement). Take the
      // 38th-smallest live id when one exists, else the largest.
      val probe = ev.select("user_id").distinct().orderBy("user_id")
        .limit(38).collect().last.getLong(0)
      val probeRows = ev.filter(col("user_id") === probe).count()
      require(probeRows > 0,
        s"sortskip: probe key $probe matches zero rows — the skip " +
          "measurement would be vacuous")
      def legQ(layout: String): Long =
        hashSink(spark.read.parquet(s"$work/$layout/events.parquet")
          .filter(col("user_id") === probe)
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(20,4)")).as("sv")),
          "sortskip")
      val im = new InputMeter
      spark.sparkContext.addSparkListener(im)
      def meterInput(fn: => Long): (Double, Long, Long, Long) = {
        val (b0, r0) = (im.bytes, im.records)
        val t0 = System.nanoTime()
        val h = fn
        val sec = ((System.nanoTime() - t0) / 1e7).round / 100.0
        org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext)
        (sec, im.bytes - b0, im.records - r0, h)
      }
      val sorted = meterInput(legQ("sorted"))
      val scattered = meterInput(legQ("scattered"))
      spark.sparkContext.removeSparkListener(im)
      require(sorted._4 == scattered._4,
        s"sortskip: layouts disagree on the probe result " +
          s"(hash ${sorted._4} vs ${scattered._4})")
      def jqi(t: (Double, Long, Long, Long)): String =
        s"""{"sec":${t._1},"input_mb":${(t._2 / 1e6 * 10).round / 10.0},""" +
          s""""input_rows":${t._3}}"""
      println(s"""{"mult":$mult,"events":$nEvents,"probe_user":$probe,""" +
        s""""sorted":${jqi(sorted)},"scattered":${jqi(scattered)},""" +
        s""""result_hash_equal":true}""")
    } else if (mode == "mergetree") {
      // r74's full-layout read at M (round 17): the salted events
      // written day-partitioned + user-bucketed (the gate's builder,
      // reused verbatim), probed by the day-sliced per-user top-20
      // rollup, vs the SAME rollup over the plain parquet. Claims:
      //  - decoded input rows on the layout ∝ the day slice (~1/30 of
      //    the corpus at every M; the plain leg's ts-expression filter
      //    cannot push down and decodes everything);
      //  - the layout leg's aggregation shuffles ZERO bytes at every M
      //    (bucket spec satisfies the user-grain distribution; top-20
      //    is a TakeOrdered merge) while the plain leg's exchange
      //    grows ∝ (users × M);
      //  - result hashes equal — layout must never change answers.
      val nEvents = offsetSaltedEvents(spark, sfDir, mult, work)
      import graft.queries.RefQueries
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(RefQueries.bucketedEventsPath(work)))
      RefQueries.clearBucketedMemo()
      // build + warm untimed; the measured leg is the READ
      hashSink(RefQueries.part_bucketed_rollup(spark, work), "mergetree")
      def plainRollup = spark.read.parquet(s"$work/events.parquet")
        .filter(date_format(col("ts"), "yyyyMMdd").cast("int") === 20240115)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sv"),
          max("event_id").as("max_id"))
        .orderBy(desc("n"), asc("user_id"))
        .limit(20)
      val im = new InputMeter
      spark.sparkContext.addSparkListener(im)
      def metered(fn: => Long)
          : (((Double, Double, Double, Long), Long, Long), Long) = {
        org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext)
        val r0 = im.records
        val r = meterLeg(fn)
        (r, im.records - r0)
      }
      var hL = 0L; var hP = 0L
      val layout = metered {
        hL = hashSink(RefQueries.part_bucketed_rollup(spark, work),
          "mergetree"); nEvents }
      val plain = metered {
        hP = hashSink(plainRollup, "mergetree"); nEvents }
      spark.sparkContext.removeSparkListener(im)
      require(hL == hP,
        s"mergetree: layout read diverged from the plain rollup " +
          s"(hash $hL vs $hP)")
      // --- the TTL maintenance pass over the same layout (round-17
      // VERDICT #6): two calls split the two grains so each is
      // measured alone.
      //  grain 1 (midnight cutoff): days 1–14 expire WHOLE — the pass
      //    costs one column-pruned stats scan (ts + partition dirs;
      //    input_mb is the ts column, not the table) plus directory
      //    deletes; NO data column is ever decoded and nothing is
      //    rewritten.
      //  grain 2 (noon cutoff on the survivor): day 15 straddles —
      //    the stats scan now covers only the surviving 16 days, and
      //    the rewrite decodes the ONE boundary day (the
      //    deleteInPartitions handoff: no rediscovery over days
      //    16–30). input_rows stays ~(16/30)N + 2×(N/30), far from
      //    the 2N a naive filter-rewrite pays.
      // The end state is hash-checked against the plain parquet with
      // the same cutoff — the maintenance pass must never change
      // answers, only reclaim bytes.
      val tbl = RefQueries.partBucketedFor(spark, work)
      val im2 = new InputMeter
      spark.sparkContext.addSparkListener(im2)
      def ttlMetered(fn: => (Int, Int))
          : (Double, Double, Long, Int, Int) = {
        org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext)
        val (r0, b0) = (im2.records, im2.bytes)
        val t0 = System.nanoTime()
        val (dropped, rewritten) = fn
        org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext)
        (((System.nanoTime() - t0) / 1e7).round / 100.0,
          ((im2.bytes - b0) / 1e6 * 10).round / 10.0,
          im2.records - r0, dropped, rewritten)
      }
      val grain1 = ttlMetered(graft.functions.ChTtl.applyTtl(spark, tbl,
        "ts", "16 DAY", "2024-01-31 00:00:00"))
      val grain2 = ttlMetered(graft.functions.ChTtl.applyTtl(spark, tbl,
        "ts", "16 DAY", "2024-01-31 12:00:00"))
      spark.sparkContext.removeSparkListener(im2)
      def jt(t: (Double, Double, Long, Int, Int)): String =
        s"""{"sec":${t._1},"input_mb":${t._2},"input_rows":${t._3},""" +
          s""""dropped":${t._4},"rewritten":${t._5}}"""
      val hT = hashSink(spark.table(tbl)
        .select("event_id", "user_id", "event_type", "value", "ts"),
        "mergetree-ttl")
      val hO = hashSink(spark.read.parquet(s"$work/events.parquet")
        .filter(col("ts") >= lit(java.sql.Timestamp.valueOf(
          "2024-01-15 12:00:00")))
        .select("event_id", "user_id", "event_type", "value", "ts"),
        "mergetree-ttl")
      require(hT == hO,
        s"mergetree TTL: survivor set diverged from the cutoff oracle " +
          s"(hash $hT vs $hO)")
      println(s"""{"mult":$mult,"events":$nEvents,""" +
        s""""layout":${jq(layout._1._1)},""" +
        s""""layout_input_rows":${layout._2},""" +
        s""""layout_max_task_ms":${layout._1._2},""" +
        s""""layout_max_reduce_ms":${layout._1._3},""" +
        s""""plain":${jq(plain._1._1)},""" +
        s""""plain_input_rows":${plain._2},""" +
        s""""plain_max_task_ms":${plain._1._2},""" +
        s""""plain_max_reduce_ms":${plain._1._3},""" +
        s""""ttl_drop":${jt(grain1)},"ttl_boundary":${jt(grain2)},""" +
        s""""result_hash_equal":true}""")
    } else if (mode == "projection") {
      // r81's automatic projection rewrite at M (round 18): the same
      // per-user rollup paid two ways over a catalog fact table of
      // salted events — conf OFF (aggregate the fact: full scan +
      // key-grain exchange, both ∝ M) vs conf ON (the optimizer swaps
      // in the materialized projection: the scan is |users| rows and
      // the only "aggregation" already happened at MATERIALIZE time).
      // The materialize cost itself is reported — it is the honest
      // price of the read-path win, paid once per maintenance cycle
      // like CH's merge-time projection upkeep. Hashes asserted equal.
      val nEvents = offsetSaltedEvents(spark, sfDir, mult, work)
      graft.functions.ChCompat.registerAll(spark)
      spark.sql("DROP TABLE IF EXISTS scale_projbase")
      spark.sql(s"""CREATE TABLE scale_projbase
        (event_id BIGINT, user_id BIGINT, value DOUBLE, event_type STRING)
        USING parquet LOCATION '$work/projbase'""")
      spark.read.parquet(s"$work/events.parquet")
        .select("event_id", "user_id", "value", "event_type")
        .write.mode("append").insertInto("scale_projbase")
      graft.functions.ChCompat.sql(spark,
        """ALTER TABLE scale_projbase ADD PROJECTION by_user (
          SELECT user_id, count() AS n,
                 sum(CAST(value AS DECIMAL(18,6))) AS sv,
                 max(event_id) AS max_id
          GROUP BY user_id)""")
      val tm0 = System.nanoTime()
      graft.functions.ChCompat.sql(spark,
        "ALTER TABLE scale_projbase MATERIALIZE PROJECTION by_user")
      val matSec = ((System.nanoTime() - tm0) / 1e7).round / 100.0
      def rollup = spark.sql("""
        SELECT user_id, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv,
               max(event_id) AS max_id
        FROM scale_projbase GROUP BY user_id""")
      val im = new InputMeter
      spark.sparkContext.addSparkListener(im)
      def metered(fn: => Long)
          : (((Double, Double, Double, Long), Long, Long), Long) = {
        org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext)
        val r0 = im.records
        val r = meterLeg(fn)
        (r, im.records - r0)
      }
      spark.conf.set(graft.functions.ChProjections.autoConfKey, "false")
      hashSink(rollup, "projection") // warm untimed
      var hB = 0L; var hP = 0L
      val base = metered { hB = hashSink(rollup, "projection"); nEvents }
      spark.conf.set(graft.functions.ChProjections.autoConfKey, "true")
      require(rollup.queryExecution.optimizedPlan.collectFirst {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        }.isEmpty,
        "projection: the auto-rewrite did not fire")
      hashSink(rollup, "projection") // warm untimed
      val proj = metered { hP = hashSink(rollup, "projection"); nEvents }
      spark.sparkContext.removeSparkListener(im)
      spark.conf.unset(graft.functions.ChProjections.autoConfKey)
      require(hB == hP,
        s"projection: rewritten read diverged from the base aggregate " +
          s"(hash $hB vs $hP)")
      println(s"""{"mult":$mult,"events":$nEvents,""" +
        s""""materialize_sec":$matSec,""" +
        s""""base":${jq(base._1._1)},"base_input_rows":${base._2},""" +
        s""""base_max_task_ms":${base._1._2},""" +
        s""""projected":${jq(proj._1._1)},""" +
        s""""projected_input_rows":${proj._2},""" +
        s""""projected_max_task_ms":${proj._1._2},""" +
        s""""result_hash_equal":true}""")
    } else if (mode == "zorderskip") {
      // The FOURTH write-layout lever (round 16): sortskip measures
      // single-key clustering — tight row-group stats on the sort key,
      // full-range stats on every other column, so only the LEADING
      // key skips. The Zorder operator (p05's key, Zorder.zkey2)
      // interleaves two dimensions into one Morton key; sorting the
      // write by it gives every row group a bounding BOX — bounded
      // span in BOTH dimensions — so a selective predicate on EITHER
      // column prunes. This leg pays the same corpus two ways (linear
      // user_id sort vs Morton(user_id, event_id) sort) and probes
      // each with BOTH predicates (a user_id point, an event_id
      // 1000-id range), asserting per-predicate result-hash equality
      // across layouts. Claim: linear skips on user but decodes
      // ~everything on event; z-order skips on BOTH (paying a modest
      // factor on user vs the dedicated sort — the classic trade).
      val nEvents = offsetSaltedEvents(spark, sfDir, mult, work)
      val ev = spark.read.parquet(s"$work/events.parquet")
      // scale raw ids into the 16-bit Morton domain (order-preserving
      // integer div — the STORED columns keep raw values; parquet
      // stats and predicates see those, the scaling only shapes the
      // interleave). The salt offsets user/event ids by k·10⁷, so the
      // domains are data-derived, not assumed.
      val mx = ev.agg(max("user_id"), max("event_id")).first()
      val su = math.max(1L, mx.getLong(0) / 65535L + 1L)
      val se = math.max(1L, mx.getLong(1) / 65535L + 1L)
      ev.repartitionByRange(32, col("user_id"))
        .sortWithinPartitions("user_id")
        .write.mode("overwrite").parquet(s"$work/linear/events.parquet")
      graft.operators.Zorder.writeZOrdered(ev,
        s"$work/zorder/events.parquet",
        expr(s"user_id div $su"), expr(s"event_id div $se"),
        bits = 16, numFiles = 32)
      val probeU = ev.select("user_id").distinct().orderBy("user_id")
        .limit(38).collect().last.getLong(0)
      val e0 = ev.agg(min("event_id")).first().getLong(0)
      val (eLo, eHi) = (e0 + 100L, e0 + 1099L)
      val uRows = ev.filter(col("user_id") === probeU).count()
      val eRows = ev.filter(col("event_id").between(eLo, eHi)).count()
      require(uRows > 0 && eRows > 0,
        s"zorderskip: probes match $uRows/$eRows rows — vacuous")
      def legQ(layout: String, pred: org.apache.spark.sql.Column): Long =
        hashSink(spark.read.parquet(s"$work/$layout/events.parquet")
          .filter(pred)
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(20,4)")).as("sv")),
          "zorderskip")
      val im = new InputMeter
      spark.sparkContext.addSparkListener(im)
      def meterInput(fn: => Long): (Double, Long, Long, Long) = {
        val (b0, r0) = (im.bytes, im.records)
        val t0 = System.nanoTime()
        val h = fn
        val sec = ((System.nanoTime() - t0) / 1e7).round / 100.0
        org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext)
        (sec, im.bytes - b0, im.records - r0, h)
      }
      val uPred = col("user_id") === probeU
      val ePred = col("event_id").between(eLo, eHi)
      val linU = meterInput(legQ("linear", uPred))
      val zoU = meterInput(legQ("zorder", uPred))
      val linE = meterInput(legQ("linear", ePred))
      val zoE = meterInput(legQ("zorder", ePred))
      spark.sparkContext.removeSparkListener(im)
      require(linU._4 == zoU._4 && linE._4 == zoE._4,
        "zorderskip: layouts disagree on a probe result " +
          s"(user ${linU._4} vs ${zoU._4}; event ${linE._4} vs ${zoE._4})")
      def jqi(t: (Double, Long, Long, Long)): String =
        s"""{"sec":${t._1},"input_mb":${(t._2 / 1e6 * 10).round / 10.0},""" +
          s""""input_rows":${t._3}}"""
      println(s"""{"mult":$mult,"events":$nEvents,""" +
        s""""probe_user":$probeU,"probe_event_lo":$eLo,""" +
        s""""linear_user":${jqi(linU)},"zorder_user":${jqi(zoU)},""" +
        s""""linear_event":${jqi(linE)},"zorder_event":${jqi(zoE)},""" +
        s""""result_hash_equal":true}""")
    } else if (mode == "bpek") {
      // The production-k BPE leg (VERDICT r13 #3): the trainer is one
      // corpus scan + a driver-side merge loop, so wall must be ~flat
      // in k. Collect the vocabulary once (timed), then time the
      // driver loop at k = 3 / 64 / 256 / 1024 — the k=3→64 step is
      // the round-13→14 upgrade; 256/1024 extrapolate toward
      // production merge counts. `mult` is unused (the sweep is in k,
      // not corpus size).
      import graft.queries.PipelineQueries
      val t0 = System.nanoTime()
      val wf0 = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(explode(graft.functions.TextFunctions
          .tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("wf"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val scanSec = ((System.nanoTime() - t0) / 1e7).round / 100.0
      val sweep = Seq(3, 64, 256, 1024).map { k =>
        val t1 = System.nanoTime()
        val (merges, _) = PipelineQueries.trainBpe(wf0, k)
        val sec = ((System.nanoTime() - t1) / 1e7).round / 100.0
        s""""k$k":{"sec":$sec,"merges":${merges.size}}"""
      }
      // synthetic LARGE-vocabulary leg: the corpus vocabulary is tiny
      // (synthetic text draws from ~31 words), so the incremental-vs-
      // full-recount comparison gets its numbers here — 50k distinct
      // base-26 words with zipf-ish weights, deterministic (no RNG).
      // The naive form recounts every word every round (O(k·V·len));
      // the incremental form touches only words containing the merged
      // pair. Merge sequences are spec-pinned identical, so this leg
      // measures the same training run twice.
      val synth = Array.tabulate(50000) { i =>
        val sb = new java.lang.StringBuilder
        var x = i + 26 * 26 * 26 * 26
        while (x > 0) { sb.append(('a' + x % 26).toChar); x /= 26 }
        (sb.toString, math.max(50000L / (i + 1), 1L))
      }.distinctBy(_._1)
      def t(fn: => Unit): Double = {
        val t1 = System.nanoTime(); fn
        ((System.nanoTime() - t1) / 1e7).round / 100.0
      }
      val synthSweep = Seq(64, 512, 4096).map { k =>
        val inc = t(PipelineQueries.trainBpe(synth, k))
        // the recount form is the measured baseline; cap it at k=512
        // (its cost is the point being demonstrated)
        val naive =
          if (k <= 512) t(PipelineQueries.trainBpeNaive(synth, k))
          else -1.0
        s""""synth_k$k":{"incremental_sec":$inc,"naive_sec":$naive}"""
      }
      println(s"""{"vocab":${wf0.length},"scan_sec":$scanSec,""" +
        sweep.mkString(",") + "," +
        s""""synth_vocab":${synth.length},""" +
        synthSweep.mkString(",") + "}")
    } else if (mode == "ann") {
      // salted corpora land in parquet first (same rationale as graph
      // mode); queries stay the copy-0 probe set, the realistic shape
      // where the corpus grows under a fixed query workload
      saltedEmbeddings(spark, sfDir, mult, growIndex = true)
        .write.mode("overwrite").parquet(s"$work/replica/embeddings.parquet")
      saltedEmbeddings(spark, sfDir, mult, growIndex = false)
        .write.mode("overwrite").parquet(s"$work/grown/embeddings.parquet")
      val nVecs = spark.read
        .parquet(s"$work/replica/embeddings.parquet").count()
      // index grows with corpus (bucket size constant): probe cost
      // should be FLAT in M apart from the broadcast-join scan
      val s02Replica = time(
        graft.queries.PipelineQueries.ann_ivf(spark, s"$work/replica").count())
      // index fixed (bucket size ∝ M): scoring volume must be ∝ M
      val s02Grown = time(
        graft.queries.PipelineQueries.ann_ivf(spark, s"$work/grown").count())
      // blocked near-dup pair join: within-block pairs constant per
      // block, blocks ∝ M → linear total
      val d05 = time(graft.queries.PipelineQueries
        .embedding_neardup(spark, s"$work/replica").count())
      // banded LSH: fixed 4×16-bucket table, so per-band collision
      // probability is ~flat and candidates ∝ N·Q — the candidate
      // shuffle (ids only) must grow linearly while vectors never move
      val s08 = time(graft.queries.PipelineQueries
        .ann_lsh(spark, s"$work/replica").count())
      // two-stage refine: the ADC stage scans probed cells (∝ cell
      // size), the refine streams the corpus against a broadcast
      // Q×30 shortlist — wall should track s07's, shuffle stay tiny.
      // Index BUILD (k-means + PQ fit on the fresh rehearsal corpus)
      // is warmed OUTSIDE the timer — it is a one-time sample-bounded
      // cost, and timing it would drown the probe curve this leg is
      // meant to read (first measured run: 17-35 s of which ~95% was
      // training)
      graft.queries.PipelineQueries.pq_ivf_rerank(spark, s"$work/replica")
      // flush the async listener bus so the warm-up's training-stage
      // completion events can't leak into the timed leg's shuffle
      // numbers (time() only flushes AFTER its body)
      org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext)
      val s09 = time(graft.queries.PipelineQueries
        .pq_ivf_rerank(spark, s"$work/replica").count())
      // s11 k-NN graph on the grown-index corpus: every vector is a
      // query, so total candidate volume is N·|block| — with nlist ∝ N
      // (growIndex) block size is constant and the leg must be LINEAR
      // in M; sum(rank) forces the bounded-top-k pipeline to run
      val s11 = time(graft.queries.PipelineQueries
        .knn_graph(spark, s"$work/replica")
        .agg(sum("rank")).first().getLong(0))
      println(s"""{"mult":$mult,"vectors":$nVecs,""" +
        s""""s02_replica":${jq(s02Replica)},"s02_grown":${jq(s02Grown)},""" +
        s""""d05":${jq(d05)},"s08":${jq(s08)},"s09":${jq(s09)},""" +
        s""""s11":${jq(s11)}}""")
    } else if (mode == "text") {
      saltedCorpus(spark, sfDir, mult).write.mode("overwrite")
        .parquet(s"$work/documents.parquet")
      val nDocs = spark.read.parquet(s"$work/documents.parquet").count()
      val t07 =
        time(graft.queries.PipelineQueries.tfidf(spark, work).count())
      val t06 =
        time(graft.queries.PipelineQueries.vocab(spark, work).count())
      val t04 =
        time(graft.queries.PipelineQueries.fingerprint(spark, work).count())
      // t12 LM scoring: the rotation grows the VOCABULARY ∝ M (every
      // token changes per copy) while per-doc token counts stay flat —
      // the broadcast model side must grow linearly, the per-doc side
      // not at all
      val t12 =
        time(graft.queries.PipelineQueries.lm_score(spark, work).count())
      // p11 scale-safe curriculum: histogram pass is ∝ distinct
      // lengths (flat-ish), decile CASE is map-only, batch rank is
      // two-level bucketed — per-doc cost must stay flat in M, and no
      // single task may see more than a (decile, md5-prefix) slice.
      // Consume sum(batch) via first() (NOT .count(): a trailing
      // count() lets Catalyst prune the unused rank window — the very
      // subtree this leg measures — out of the executed plan; the
      // d10 lesson, which the first cut of this leg re-learned)
      val p11 = time(graft.queries.PipelineQueries
        .curriculum_scale(spark, work)
        .agg(sum(col("batch"))).first().getLong(0))
      // t22 theta overlap matrix: sources are SHARED across copies, so
      // per-source window cardinality grows ∝ M — the leg crosses the
      // θ = 1 exactness boundary (16k nominal) around M≈12 and must
      // keep DEGRADING GRACEFULLY, not blow up: sketch payloads are
      // capped at ~k entries regardless of M, the matrix stays
      // sources², and wall should track the one corpus scan. Sum the
      // overlap column so the intersection expressions can't be pruned.
      val t22 = time(graft.queries.PipelineQueries
        .source_overlap(spark, work)
        .agg(sum(col("overlap")), count(lit(1))).first().getLong(1))
      println(s"""{"mult":$mult,"docs":$nDocs,""" +
        s""""t07":${jq(t07)},"t06":${jq(t06)},"t04":${jq(t04)},""" +
        s""""t12":${jq(t12)},"p11":${jq(p11)},"t22":${jq(t22)}}""")
    } else if (mode == "semantic") {
      // d09 SemDeDup: intra-cell pair work is Σ cell². Two regimes:
      //  - cells FIXED (32) while the corpus grows M× → cell size ∝ M,
      //    pair work ∝ M² — the shape that must be AVOIDED at scale;
      //  - cells RAISED ∝ M (32·M) → cell size constant, pair work
      //    linear — the 100-TB contract (SemDeDup's own k≈10⁵ on 8B
      //    docs is this regime). The literal-centroid probe is the
      //    moderate-k form; past ~1k cells assignment becomes a
      //    broadcast-table join, same plan shape.
      saltedEmbeddings(spark, sfDir, mult, growIndex = true)
        .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
      val corpus = spark.read.parquet(s"$work/embeddings.parquet")
      val nVecs = corpus.count()
      val cFixed = graft.operators.Similarity.trainQuantizer(
        corpus, nClusters = 32, maxTrainRows = 20000L)
      val dFixed = time(graft.operators.Similarity
        .semanticDedup(corpus, cFixed, threshold = 0.35).count())
      val cGrown = graft.operators.Similarity.trainQuantizer(
        corpus, nClusters = 32 * mult, maxTrainRows = 20000L)
      val dGrown = time(graft.operators.Similarity
        .semanticDedup(corpus, cGrown, threshold = 0.35).count())
      println(s"""{"mult":$mult,"vectors":$nVecs,""" +
        s""""d09_fixed_cells":${jq(dFixed)},""" +
        s""""d09_grown_cells":${jq(dGrown)}}""")
    } else if (mode == "streaming") {
      // The streaming STATE path — the gates' own code (r53 stateful
      // dedup, r55 flatMapGroupsWithState sessionize, r57 sketch-in-
      // state), RocksDB state store, measured through
      // StreamingQueryProgress.stateOperators. Salting: copy k
      // offsets event_id AND user_id by k·10⁷ while ts/props are
      // SHARED — so the three state regimes separate cleanly:
      //  - r53 dedup state = one key per distinct event id → rows ∝ M
      //    (the store must scale with the corpus; RocksDB puts that
      //    on disk, not heap — the 100-TB constraint this leg exists
      //    to measure);
      //  - r55 session state = one row per ACTIVE user → rows ∝ M
      //    (users ∝ M), emitted sessions ∝ M;
      //  - r57 sketch state = one bounded sketch per day → rows FLAT
      //    in M (days shared), the whole point of sketch aggregation.
      val nEvents = offsetSaltedEvents(spark, sfDir, mult, work)
      def stateJson(gate: String): String = {
        val progs = graft.queries.StreamingQueries.progressByGate
          .getOrElse(gate, Seq.empty)
        val withOps = progs.filter(_.stateOperators.nonEmpty)
        def maxOver(f: org.apache.spark.sql.streaming.StateOperatorProgress => Long) =
          withOps.map(_.stateOperators.map(f).sum).foldLeft(0L)(math.max)
        val rows = maxOver(_.numRowsTotal)
        val mem = maxOver(_.memoryUsedBytes)
        val sst = maxOver(p => Option(p.customMetrics)
          .flatMap(m => Option(m.get("rocksdbSstFileSize")))
          .map(_.longValue).getOrElse(0L))
        s"""{"batches":${withOps.size},"state_rows":$rows,""" +
          s""""state_mem_bytes":$mem,"rocksdb_sst_bytes":$sst}"""
      }
      val r53 = time(
        graft.queries.StreamingQueries.stream_dedup(spark, work).count())
      val s53 = stateJson("r53")
      val r55 = time(
        graft.queries.StreamingQueries.stream_sessionize(spark, work).count())
      val s55 = stateJson("r55")
      val r57 = time(
        graft.queries.StreamingQueries.stream_topk(spark, work).count())
      val s57 = stateJson("r57")
      // r58 leg: M salted copies of embeddings through the streaming
      // cell-ingestion gate. The cell set is fixed by centroidsFor's
      // nClusters=8 regardless of the label treatment (the gate never
      // reads `label`; growIndex only varies the labels), so per-cell
      // occupancy state must stay FLAT at nlist rows while ingested
      // vectors grow ∝ M
      saltedEmbeddings(spark, sfDir, mult, growIndex = false)
        .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
      val nVecs = spark.read.parquet(s"$work/embeddings.parquet").count()
      val r58 = time(graft.queries.StreamingQueries
        .stream_ann_ingest(spark, work).count())
      val s58 = stateJson("r58")
      // r59 leg: the STATELESS contrast — the anti-join keeps no join
      // state (static side re-broadcasts per batch), so state rows
      // must stay FLAT at the per-source rollup's ~20 rows while
      // streamed docs grow ∝ M (the rotation salt keeps sources
      // shared across copies)
      saltedCorpus(spark, sfDir, mult).write.mode("overwrite")
        .parquet(s"$work/documents.parquet")
      val nDocs = spark.read.parquet(s"$work/documents.parquet").count()
      val r59 = time(graft.queries.StreamingQueries
        .stream_decontam(spark, work).count())
      val s59 = stateJson("r59")
      // r60 leg: streamed batch AND corpus both grow ∝ M (odd/even
      // split of the salted corpus), so verified pairs — and the
      // pair-granularity state — must grow exactly ∝ M while the
      // static index broadcast stays per-batch; wall includes the
      // in-gate index build (index-build cost is measured separately
      // by the d15 batch leg)
      val r60 = time(graft.queries.StreamingQueries
        .stream_neardup(spark, work).count())
      val s60 = stateJson("r60")
      // r64 leg: theta-sketch state — sources are shared across
      // copies, so streamed windows grow ∝ M while state must stay
      // FLAT at one row per source with sketch bytes capped at the
      // nominal threshold (state is sized by the ARTIFACT's
      // resolution, the r57/r58 property, here under growth that
      // crosses the sketch's exact→estimating boundary)
      val r64 = time(graft.queries.StreamingQueries
        .stream_theta_overlap(spark, work).count())
      val s64 = stateJson("r64")
      // r66 leg: running-offset placement — langs are shared across
      // copies (the rotation salt keeps the lang column), so streamed
      // docs grow ∝ M while GroupState must stay FLAT at one LONG per
      // lang (~5 rows) — the smallest state shape in the family; the
      // append-only sink grows ∝ M, never rewritten
      val r66 = time(graft.queries.StreamingQueries
        .stream_concat_chunk(spark, work)
        .agg(sum("start_off"), sum("last_example")).first().getLong(0))
      val s66 = stateJson("r66")
      // r68 leg (added round 14): per-source rank counter — sources
      // are shared across copies (the rotation salt keeps the source
      // column), so streamed docs grow ∝ M while GroupState must stay
      // FLAT at one LONG per source (~20 rows). The gate's two-leg
      // checkpoint restart runs INSIDE, so this leg also re-proves
      // recovery at M; leg-2's state is the resumed store (the
      // interesting one), reported alongside leg-1's
      val r68 = time(graft.queries.StreamingQueries
        .stream_interleave_recovery(spark, work)
        .agg(sum("interleave_key")).first().getLong(0))
      val s68l1 = stateJson("r68_leg1"); val s68l2 = stateJson("r68_leg2")
      println(s"""{"mult":$mult,"events":$nEvents,"vectors":$nVecs,""" +
        s""""docs":$nDocs,""" +
        s""""r53":${jq(r53)},"r53_state":$s53,""" +
        s""""r55":${jq(r55)},"r55_state":$s55,""" +
        s""""r57":${jq(r57)},"r57_state":$s57,""" +
        s""""r58":${jq(r58)},"r58_state":$s58,""" +
        s""""r59":${jq(r59)},"r59_state":$s59,""" +
        s""""r60":${jq(r60)},"r60_state":$s60,""" +
        s""""r64":${jq(r64)},"r64_state":$s64,""" +
        s""""r66":${jq(r66)},"r66_state":$s66,""" +
        s""""r68":${jq(r68)},"r68_leg1_state":$s68l1,""" +
        s""""r68_leg2_state":$s68l2}""")
    } else if (mode == "clean") {
      // the corpus-cleaning path: p06 boilerplate removal (its
      // boilerplate paragraph SET stays ~22 entries at every M —
      // sources are shared across copies — so the broadcast anti-join
      // side must stay constant while the reassembly shuffle grows
      // linearly), d08 URL dedup (100 canonical groups at every M,
      // dups ∝ M: partial aggregation must keep shuffle rows bounded
      // by partitions × groups, NOT input rows), and t11 PII scrub
      // (map-only contrast leg — shuffle ~0 at every M)
      saltedCorpus(spark, sfDir, mult).write.mode("overwrite")
        .parquet(s"$work/documents.parquet")
      val nDocs = spark.read.parquet(s"$work/documents.parquet").count()
      val p06 = time(
        graft.queries.PipelineQueries.boilerplate_clean(spark, work).count())
      val d08 = time(
        graft.queries.PipelineQueries.url_dedup(spark, work).count())
      val t11 = time(
        graft.queries.PipelineQueries.pii_scrub(spark, work).count())
      println(s"""{"mult":$mult,"docs":$nDocs,""" +
        s""""p06":${jq(p06)},"d08":${jq(d08)},"t11":${jq(t11)}}""")
    } else if (mode == "dedup") {
      saltedCorpus(spark, sfDir, mult).write.mode("overwrite")
        .parquet(s"$work/documents.parquet")
      val nDocs = spark.read.parquet(s"$work/documents.parquet").count()
      val d02 =
        time(graft.queries.PipelineQueries.minhash_lsh_dedup(spark, work).count())
      val p02 =
        time(graft.queries.PipelineQueries.neardup_groups(spark, work).count())
      // d14 bloom pre-filter: the corpus bit set is capped at m=1024
      // rows at EVERY M (the broadcast side must not grow), while the
      // batch probe is map-side ∝ M; as the filter saturates the
      // maybe_dup fraction climbs toward 1 — the curve that tells a
      // deployment to re-size m ∝ corpus. Aggregate the booleans so
      // the probe join can't be pruned under count.
      val d14 = time(graft.queries.PipelineQueries
        .bloom_prefilter(spark, work)
        .agg(sum(when(col("maybe_dup"), 1L).otherwise(0L)),
          count(lit(1))).first().getLong(0))
      // d15 probe leg: the claim is "probe cost independent of corpus
      // size", so the INDEX (bands + shingle hashes over the full
      // M-salted corpus) is PERSISTED OUTSIDE the timer — the
      // index-build contract — and the timed section is a FIXED
      // copy-0 batch probing it: bucket equi-join + exact verify.
      // With the rotation salt, cross-copy docs share buckets only by
      // band-hash chance, so candidate volume (and probe wall) should
      // stay near-flat while the index grows ∝ M.
      val corpus = spark.read.parquet(s"$work/documents.parquet")
      val sigs = corpus.select(col("doc_id"),
        graft.functions.MinHashSig(col("text"), 5, 64).as("sig"))
      graft.operators.TextDedup
        .lshBuckets(sigs, "doc_id", "sig", bands = 16, rowsPerBand = 4)
        .write.mode("overwrite").parquet(s"$work/d15_index.parquet")
      corpus.select(col("doc_id"),
          graft.functions.ShingleHashSorted(col("text"), 5).as("sh"))
        .write.mode("overwrite").parquet(s"$work/d15_sh.parquet")
      org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext)
      val probeDocs = spark.read
        .parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % 2 === 1)
      val d15 = time {
        val idx = spark.read.parquet(s"$work/d15_index.parquet")
        val sh = spark.read.parquet(s"$work/d15_sh.parquet")
        val prb = graft.operators.TextDedup.lshBuckets(
          probeDocs.select(col("doc_id"),
            graft.functions.MinHashSig(col("text"), 5, 64).as("sig")),
          "doc_id", "sig", bands = 16, rowsPerBand = 4)
        val cand = graft.operators.TextDedup
          .candidatePairsAcross(prb, idx, "doc_id")
          .filter(col("probe_id") =!= col("index_id"))
        val prbSh = probeDocs.select(col("doc_id").as("probe_id"),
          graft.functions.ShingleHashSorted(col("text"), 5).as("sh_a"))
        // corpus arrays first (ids-only candidate shuffle), batch
        // arrays broadcast last — the gate's join-order rationale
        cand.join(sh.select(col("doc_id").as("index_id"),
            col("sh").as("sh_b")), Seq("index_id"))
          .join(broadcast(prbSh), Seq("probe_id"))
          .withColumn("inter", graft.functions.SortedLongIntersect(
            col("sh_a"), col("sh_b")))
          .withColumn("un",
            size(col("sh_a")) + size(col("sh_b")) - col("inter"))
          .filter(col("inter").cast("double") / col("un") >= 0.8)
          .count()
      }
      println(s"""{"mult":$mult,"docs":$nDocs,""" +
        s""""d02":${jq(d02)},"p02":${jq(p02)},"d14":${jq(d14)},""" +
        s""""d15_probe":${jq(d15)}}""")
    } else if (mode == "edit") {
      // d17 vs d18 candidate-growth A/B — the composed-blocking claim,
      // measured. The rotation salt preserves LENGTHS exactly (translate
      // is a bijection on characters), so under d17's length-band key
      // every cross-copy length-neighbour pair is a candidate: the
      // candidate count must grow ∝ M². The d18 content key (MinHash
      // band buckets) decorrelates copies, so its candidates track true
      // pairs ∝ M. Run this mode on the sf0.01 base: the point of the
      // leg is the M² curve itself, and at the sf0.1 base M=26 the
      // length-band side would be ~549M banded Levenshteins — paying
      // that wall proves nothing the 500-doc base doesn't.
      saltedCorpus(spark, sfDir, mult).write.mode("overwrite")
        .parquet(s"$work/documents.parquet")
      val corpus = spark.read.parquet(s"$work/documents.parquet")
      val nDocs = corpus.count()
      val k = graft.queries.PipelineQueries.editK
      val lenCand = time(
        graft.queries.PipelineQueries.editLenCandidates(corpus, k).count())
      val lshCand = time(
        graft.queries.PipelineQueries.editLshCandidates(spark, work, k).count())
      // end-to-end legs: aggregate BOTH output columns so neither the
      // verify expression nor the candidate join can be pruned under
      // count (the d10 lesson — see the class doc)
      val d17 = time(graft.queries.PipelineQueries
        .edit_distance_neardup(spark, work)
        .agg(sum("dist"), count(lit(1))).first().getLong(1))
      val d18 = time(graft.queries.PipelineQueries
        .edit_distance_blocked(spark, work)
        .agg(sum("dist"), count(lit(1))).first().getLong(1))
      println(s"""{"mult":$mult,"docs":$nDocs,""" +
        s""""d17_cand":${jq(lenCand)},"d18_cand":${jq(lshCand)},""" +
        s""""d17":${jq(d17)},"d18":${jq(d18)}}""")
    } else if (mode == "annfilter") {
      // s13-vs-s14 strategy crossover at the SELECTIVE predicate
      // (lang='en' AND source='src3', ~2.4% — salting preserves the
      // ratio, so k′ = ⌈k/sel⌉ is M-invariant). The queries stay the
      // 10 copy-0 vectors (serving shape: corpus grows, query load
      // doesn't), labels grow with the corpus (growIndex — nlist ∝ N,
      // bucket size constant):
      //  - PRE-filter must move the predicate over the WHOLE corpus
      //    (ids ∝ M cross the semi-join) before the one probed block
      //    is scanned;
      //  - POST-filter touches only the probed blocks + a k′·|q|
      //    candidate join, corpus-size-independent.
      // The crossover claim s13's in-code note argues is exactly
      // "pre's semi-join term grows ∝ M while post stays flat" —
      // this leg measures both walls and both shuffle volumes.
      saltedCorpus(spark, sfDir, mult).write.mode("overwrite")
        .parquet(s"$work/documents.parquet")
      saltedEmbeddings(spark, sfDir, mult, growIndex = true)
        .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
      val docs = spark.read.parquet(s"$work/documents.parquet")
      val emb = spark.read.parquet(s"$work/embeddings.parquet")
      val nVec = emb.count()
      val elig = docs
        .filter(col("lang") === "en" && col("source") === "src3")
        .select(col("doc_id").as("vec_id"))
      val queries = emb.filter(col("vec_id") < 10)
      // Force the AT-SCALE join regime: the eligible-id set is a fixed
      // FRACTION of the corpus (2.4%), so at deployment it can never
      // broadcast — the predicate semi-join must shuffle, and the pre
      // side shuffles (vec_id, 64-float embedding, label) rows ∝ N
      // where the post side's candidate probe is k′·|q| rows at ANY
      // corpus size (that asymmetry IS the crossover claim). Without
      // this the rehearsal's small absolute sizes broadcast everything
      // and both legs measure fixed overhead. ivfTopK's own broadcast
      // HINTS (the bounded query side) are explicit and survive the
      // threshold, exactly as they would at scale.
      val savedBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // aggregate every output column so neither the verify rank nor
      // the candidate join can be pruned under count (the d10 lesson)
      val (pre, post) =
        try {
          val pre = time {
            val r = graft.operators.Similarity.ivfTopK(
              emb.join(elig, Seq("vec_id"), "left_semi"),
              queries, k = 1, blockCol = "label")
            r.agg(sum(col("query_id") + col("neighbor_id") + col("rank")))
              .first().getLong(0)
          }
          val post = time {
            graft.queries.PipelineQueries.filtered_ann_post(spark, work)
              .agg(sum(col("query_id") + col("neighbor_id") + col("rank")))
              .first().getLong(0)
          }
          (pre, post)
        } finally spark.conf.set(
          "spark.sql.autoBroadcastJoinThreshold", savedBcast)
      println(s"""{"mult":$mult,"vecs":$nVec,""" +
        s""""pre":${jq(pre)},"post":${jq(post)}}""")
    } else if (mode == "passages") {
      // d10 duplicate passages: rotation changes every token, so
      // cross-copy windows never collide — duplicated-window DENSITY
      // stays constant while windows grow ∝ M; the (hash, id) shuffle
      // must grow linearly and the dup-marker side with it. p07
      // temperature mixing rides along: sources are SHARED across
      // copies, so per-source partitions grow ∝ M and the md5-rank
      // selection must stay sort-bound within each source (the
      // 100-TB form pre-filters with Sampling.hashBucket first).
      saltedCorpus(spark, sfDir, mult).write.mode("overwrite")
        .parquet(s"$work/documents.parquet")
      val nDocs = spark.read.parquet(s"$work/documents.parquet").count()
      // NOT .count(): under count, Catalyst eliminates d10's left
      // outer join outright (the dup side's key is an aggregation key,
      // hence unique — the join can't change cardinality) and the
      // whole duplicate-detection pipeline vanishes from the measured
      // plan. Summing the output columns forces full evaluation.
      val d10 = time(graft.queries.PipelineQueries.dup_passages(spark, work)
        .agg(sum("dup_windows"), sum("n_windows")).first().getLong(0))
      val p07 =
        time(graft.queries.PipelineQueries.temperature_mix(spark, work).count())
      // t15/d12 CDC legs: the same rotation argument — cross-copy
      // chunk hashes never collide, so chunk-duplication DENSITY
      // stays constant while chunks grow ∝ M. t15 is explode +
      // per-doc prefix-sum + one groupBy (shuffle ∝ tokens); d12 adds
      // the (hash, id) dup join ∝ chunks. Aggregate outputs (not
      // count) so the left join / windows can't be pruned.
      val t15 = time(graft.queries.PipelineQueries.cdc_chunks(spark, work)
        .agg(sum("n_toks")).first().getLong(0))
      val d12 = time(graft.queries.PipelineQueries.cdc_dup_chunks(spark, work)
        .agg(sum("n_dup_chunks"), sum("n_chunks")).first().getLong(0))
      // d19/d20 exact-substring legs: translate preserves shared spans
      // WITHIN a copy and never creates them across copies, so span
      // structure replicates per copy — spans ∝ M, the (hash, doc)
      // mark shuffle ∝ corpus chars, ownership/islands/interval-union
      // shuffles (doc, ints) only, and d20's splice is map-side with
      // text crossing once into the final join. Aggregate both output
      // columns (cleaned length + cut chars) so the splice fold and
      // the cut intervals can't be pruned.
      val d19 = time(graft.queries.PipelineQueries.exact_substrings(spark, work)
        .agg(count(lit(1)), sum("span_len")).first().getLong(0))
      val d20 = time(graft.queries.PipelineQueries.exact_substr_cut(spark, work)
        .agg(sum(length(col("clean_text"))), sum("cut_chars"))
        .first().getLong(0))
      // p18 composed leg (added round 14): cut → pack → manifest as
      // ONE plan; cost must track d20's (the dominant stage) plus the
      // per-lang packing window — super-linear drift here means the
      // COMPOSITION added a shuffle the standalone gates don't have
      val p18 = time(graft.queries.PipelineQueries.lee_pipeline(spark, work)
        .agg(sum("sum_tokens"), sum("n_docs")).first().getLong(0))
      println(s"""{"mult":$mult,"docs":$nDocs,""" +
        s""""d10":${jq(d10)},"p07":${jq(p07)},""" +
        s""""t15":${jq(t15)},"d12":${jq(d12)},""" +
        s""""d19":${jq(d19)},"d20":${jq(d20)},"p18":${jq(p18)}}""")
    } else {
      // salted inputs land in parquet FIRST so the measured section is
      // the engine, not the salting union
      saltedEdges(spark, sfDir, mult).write.mode("overwrite")
        .parquet(s"$work/edges.parquet")
      saltedCorpus(spark, sfDir, mult).write.mode("overwrite")
        .parquet(s"$work/documents.parquet")
      val edges = spark.read.parquet(s"$work/edges.parquet")
      val nEdges = edges.count()
      val g04 = time {
        val ranks = graft.graph.PageRank.run(edges, iterations = 5)
        graft.graph.PageRank.withResidual(edges, ranks).count()
      }
      val g05 =
        time(graft.queries.PipelineQueries.neardup_triangles(spark, work).count())
      // g07 k-core leg over the same salted near-dup graph: per round
      // one degree agg + two semi-joins, edge list only shrinks —
      // cost must be ∝ edges per round (aggregate the output so the
      // semi-join chain can't be pruned under count)
      val g07 = time(graft.queries.PipelineQueries.kcore(spark, work)
        .agg(coalesce(sum(col("degree")), lit(0L))).first().getLong(0))
      // g08 two-hop leg: copies are disjoint, so Σ deg² is ∝ M and the
      // wedge join + distinct must track it linearly (the distinct's
      // shuffle carries (id, id) pairs only)
      val g08 = time(graft.queries.PipelineQueries.twohop(spark, work)
        .agg(coalesce(sum(col("n_reach2")), lit(0L))).first().getLong(0))
      // g11 SKEW leg: one hub at 500·M degree plus a degree-2 chain —
      // the adversarial wedge-join input (the gate corpus's bounded
      // degrees never produce it). Unguarded, the hub funnels its
      // (500·M)² two-hop expansion through ONE task; the salted form
      // spreads it over `buckets` tasks. Total wall on a 32-thread
      // box under-reports the harm (31 threads idle-wait), so the
      // leg's headline number is MAX TASK TIME — the metric that
      // becomes stragglers, speculative re-runs and OOM at 1000
      // executors. Both legs aggregate the same exact result.
      val dHub = 500L * mult
      spark.range(1, dHub + 1)
        .select(lit(0L).as("id_a"), col("id").as("id_b"))
        .union(spark.range(1, dHub)
          .select(col("id").as("id_a"), (col("id") + 1).as("id_b")))
        .coalesce(8).write.mode("overwrite")
        .parquet(s"$work/skew_pairs.parquet")
      val sk = spark.read.parquet(s"$work/skew_pairs.parquet")
      // Force the SHUFFLE-join regime for both legs: at rehearsal row
      // counts Spark broadcasts the whole edge list, which has no
      // per-key reduce task — the hub's expansion then lands on
      // whatever INPUT partition holds its arrive rows and the salt
      // can't (and needn't) do anything. At 100 TB the edge list never
      // broadcasts; the skew the guard exists for lives in the
      // hash-partitioned wedge join, so that's the plan the leg must
      // measure. The hot-set broadcast() HINT inside TwoHop is
      // explicit and survives the -1 threshold.
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // Second AQE interaction, same root cause: partition COALESCING
      // is input-byte-based, and the wedge join's input is a few MB —
      // AQE merges all 16 salt buckets back into ONE reduce task,
      // silently undoing the salt (measured: guarded max-task ==
      // unguarded at M=10). Output-explosion skew is invisible to
      // every byte-counting AQE heuristic, so the salted stage must
      // pin its partitioning (this knob, or an explicit-numPartitions
      // repartition on (key, salt)) — the deployment note is in
      // TwoHop's scaladoc.
      val prevCo = spark.conf
        .get("spark.sql.adaptive.coalescePartitions.enabled")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      def twoHopLeg(cap: Int): ((Double, Double, Double, Long), Long) = {
        val tm = new TaskMeter
        spark.sparkContext.addSparkListener(tm)
        val t = time(graft.graph.TwoHop
          .reach2(sk, degreeCap = cap, buckets = 16)
          .agg(coalesce(sum(col("n_reach2")), lit(0L))).first().getLong(0))
        org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext)
        spark.sparkContext.removeSparkListener(tm)
        (t, tm.maxMs)
      }
      val (g11u, g11uMax) = twoHopLeg(cap = 0)
      val (g11g, g11gMax) = twoHopLeg(cap = 64)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCo)
      println(s"""{"mult":$mult,"edges":$nEdges,""" +
        s""""g04":${jq(g04)},"g05":${jq(g05)},"g07":${jq(g07)},""" +
        s""""g08":${jq(g08)},""" +
        s""""g11_hub_degree":$dHub,""" +
        s""""g11_unguarded":${jq(g11u)},"g11_unguarded_max_task_ms":$g11uMax,""" +
        s""""g11_guarded":${jq(g11g)},"g11_guarded_max_task_ms":$g11gMax}""")
    }
    spark.stop()
  }
}
