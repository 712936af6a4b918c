package graft.gitee

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Gitee connector loop (SURVEY A24) with an injected page fetcher —
  * cursor pagination and the stop-at-watermark stage logic — plus the
  * B13 watermark query.
  */
class GiteeSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def star(id: Long): String =
    s"""{"id":$id,"type":"StarEvent","actor":{"id":1,"login":"u$id"},"repo":{"id":7,"full_name":"o/r"},"created_at":"2023-01-0${(id % 9) + 1}T00:00:00Z","payload":{"action":"starred"}}"""

  test("pullRepo pages with prev_id cursor until exhausted") {
    // ids 100..81 in pages of 5, cursor = min id of previous page
    val fetch: GiteeSource.PageFetcher = (_, prevId) => {
      val start = if (prevId == 0) 100L else prevId - 1
      if (start < 81) Seq.empty
      else (start to math.max(start - 4, 81) by -1).map(star)
    }
    val out = GiteeSource.pullRepo(spark, fetch, "o/r")
    assert(out.count() === 20)
    assert(out.agg(min("id"), max("id")).as[(Long, Long)].head === (81L, 100L))
  }

  test("pullRepo stops at the stored watermark (new-stage catch-up)") {
    val fetch: GiteeSource.PageFetcher = (_, prevId) => {
      val start = if (prevId == 0) 100L else prevId - 1
      if (start < 1) Seq.empty
      else (start to math.max(start - 4, 1) by -1).map(star)
    }
    // maxId already stored = 90 ⇒ stop once the cursor crosses it
    val out = GiteeSource.pullRepo(spark, fetch, "o/r", stopAtId = 90L)
    assert(out.agg(min("id")).as[Long].head <= 90L) // page overlapping the watermark is fetched
    assert(out.count() <= 15)                       // but pagination stopped there
  }

  test("watermarks: per-repo min time + argMin/argMax ids with dim join") {
    val events = Seq(
      ("Gitee", 5L, 7L, "2023-01-02 00:00:00"),
      ("Gitee", 9L, 7L, "2023-01-05 00:00:00"),
      ("Gitee", 2L, 8L, "2023-01-01 00:00:00"),
      ("GitHub", 99L, 7L, "2022-01-01 00:00:00")) // excluded
      .toDF("platform", "id", "repo_id", "s")
      .withColumn("created_at", to_timestamp(col("s")))
    val dim = Seq((7L, "o/r", "repo"), (8L, "o/x", "repo"), (7L, "org7", "org"))
      .toDF("id", "name", "type")
    val wm = GiteeSource.watermarks(events, dim)
      .orderBy("repo_id")
      .select("repo_id", "min_id", "max_id", "name")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(wm === Seq((7L, 5L, 9L, "o/r"), (8L, 2L, 2L, "o/x")))
  }

  test("dedupOrgsRepos drops exact duplicates (OPTIMIZE DEDUPLICATE analogue)") {
    val dim = Seq((7L, "o/r", "repo"), (7L, "o/r", "repo"), (8L, "o/x", "repo"))
      .toDF("id", "name", "type")
    assert(GiteeSource.dedupOrgsRepos(dim).count() === 2)
  }
}
