package graft.gitee

import graft.SparkTestBase
import graft.ingest.EventsWriter
import org.apache.spark.sql.functions._

/** Full Gitee incremental loop (A24+A25+B13+B18 together): pull canned
  * pages → normalize → Replacing-merge into the events table → the
  * watermark query reflects the new high-water mark, and a second pull
  * stopping at that watermark is idempotent.
  */
class GiteeLoopSpec extends SparkTestBase {
  import spark.implicits._

  private def star(id: Long, day: Int): String =
    f"""{"id":$id%d,"type":"StarEvent","actor":{"id":$id%d,"login":"u$id%d"},"repo":{"id":7,"full_name":"o/r"},"created_at":"2023-01-$day%02dT00:00:00Z","payload":{"action":"starred"}}"""

  test("pull -> merge -> watermark -> incremental pull is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("gloop").toFile
    val table = new java.io.File(dir, "events").getAbsolutePath

    // first pull: ids 10..1
    val fetch1: GiteeSource.PageFetcher = (_, prevId) => {
      val start = if (prevId == 0) 10L else prevId - 1
      if (start < 1) Seq.empty else (start to math.max(start - 4, 1) by -1).map(i => star(i, i.toInt))
    }
    val batch1 = GiteeSource.pullRepo(spark, fetch1, "o/r")
    EventsWriter.merge(batch1, table)
    val t1 = spark.read.parquet(table)
    assert(t1.count() === 10)

    // watermark over the stored table
    val dim = Seq((7L, "o/r", "repo")).toDF("id", "name", "type")
    val wm = GiteeSource.watermarks(t1, dim).head()
    val maxId = wm.getAs[Long]("max_id")
    assert(maxId === 10L)

    // second pull: ids 14..1 available, but stop at the stored maxId
    val fetch2: GiteeSource.PageFetcher = (_, prevId) => {
      val start = if (prevId == 0) 14L else prevId - 1
      if (start < 1) Seq.empty else (start to math.max(start - 4, 1) by -1).map(i => star(i, (i % 27 + 1).toInt))
    }
    val batch2 = GiteeSource.pullRepo(spark, fetch2, "o/r", stopAtId = maxId)
    EventsWriter.merge(batch2, table)
    val t2 = spark.read.parquet(table)
    // 4 new events (11..14); overlapping re-pulled rows dedup away
    assert(t2.count() === 14)
    assert(t2.agg(countDistinct("id")).head.getLong(0) === 14)

    // merging the same batch again changes nothing (idempotent)
    EventsWriter.merge(batch2, table)
    assert(spark.read.parquet(table).count() === 14)
  }

  /** Pages of 5, ids descending from 20; prevId=0 means newest. */
  private def pagedFetch(fetched: scala.collection.mutable.Buffer[Long])
      : GiteeSource.PageFetcher = (_, prevId) => {
    val start = if (prevId == 0) 20L else prevId - 1
    if (start < 1) Seq.empty
    else (start to math.max(start - 4, 1) by -1).map { i =>
      fetched += i; star(i, i.toInt)
    }
  }

  test("two-stage pull: new events, then old-history backfill, then 3-day stop") {
    import java.sql.Timestamp
    val ts = (day: Int) => Timestamp.valueOf(f"2023-01-$day%02d 00:00:00")

    // stored mid-range 8..12; repo created Jan 1, earliest stored Jan 8
    // → history incomplete → old stage must backfill 7..1
    val fetched = scala.collection.mutable.Buffer.empty[Long]
    val st = GiteeSource.RepoState(maxId = 12L, minId = 8L,
      createdAt = Some(ts(1)), minCreatedAt = Some(ts(8)))
    val pull = GiteeSource.pullRepoTwoStage(spark, pagedFetch(fetched), "o/r", st)
    assert(pull.complete)
    val got = pull.events.select("id").collect().map(_.getLong(0)).toSet
    assert(got === ((13L to 20L) ++ (1L to 7L)).toSet)
    // old stage started from minId, not from where the new stage stopped
    assert(fetched.containsSlice(Seq(7L, 6L, 5L, 4L, 3L)))

    // everything stored, earliest event within 3 days of repo creation
    // → new stage finds nothing and the old stage must NOT run
    val fetched2 = scala.collection.mutable.Buffer.empty[Long]
    val stFull = GiteeSource.RepoState(maxId = 20L, minId = 1L,
      createdAt = Some(ts(1)), minCreatedAt = Some(ts(1)))
    val none = GiteeSource.pullRepoTwoStage(spark, pagedFetch(fetched2), "o/r", stFull)
    assert(none.complete)
    assert(none.events.count() === 0L)
    assert(fetched2.toSet === Set(20L, 19L, 18L, 17L, 16L)) // one page, then stop
  }

  test("two-stage pull: NEW stage exhausting its page budget before the stored maxId is flagged incomplete") {
    import java.sql.Timestamp
    val ts = (day: Int) => Timestamp.valueOf(f"2023-01-$day%02d 00:00:00")

    // stored 1..2, 18 new events above it, but only 2 pages (10 ids) of
    // budget: the pull stops at id 11 without reaching maxId=2, leaving
    // ids 3..10 un-fetched — advancing the watermark to 20 would skip
    // them forever, so the batch must carry complete=false
    val fetched = scala.collection.mutable.Buffer.empty[Long]
    val st = GiteeSource.RepoState(maxId = 2L, minId = 1L,
      createdAt = Some(ts(1)), minCreatedAt = Some(ts(1)))
    val pull = GiteeSource.pullRepoTwoStage(spark, pagedFetch(fetched), "o/r", st,
      maxPages = 2)
    assert(!pull.complete)
    assert(pull.events.agg(org.apache.spark.sql.functions.min("id"))
      .head.getLong(0) === 11L)

    // same budget on a FIRST import (maxId=0) is resumable — contiguous
    // from the top, the old stage backfills below minId next run
    val first = GiteeSource.pullRepoTwoStage(spark, pagedFetch(
      scala.collection.mutable.Buffer.empty[Long]), "o/r",
      GiteeSource.RepoState(0L, 0L, None, None), maxPages = 2)
    assert(first.complete)
    assert(first.events.count() === 10L)
  }

  test("dim-table build loop: insert missing repos/orgs, split orgs, dedup") {
    val existing = Seq((7L, "o/r", "repo", java.sql.Timestamp.valueOf("2022-01-01 00:00:00")))
      .toDF("id", "name", "type", "created_at")

    val metaCalls = scala.collection.mutable.Buffer.empty[(String, String)]
    val fetchMeta: GiteeSource.MetaFetcher = (name, kind) => {
      metaCalls += ((name, kind))
      (name, kind) match {
        case ("o/new", "repo") =>
          Some("""{"id":8,"full_name":"o/new","created_at":"2023-02-01T00:00:00Z"}""")
        case ("myorg", "org") =>
          Some("""{"id":100,"created_at":"2020-01-01T00:00:00Z"}""")
        case ("o/bad", "repo") => Some("""{"message":"not found"}""") // no id → skipped
        case _ => None
      }
    }
    // org listing: page 1 full (2 of perPage=2) → page 2 short → stop
    val orgRepoCalls = scala.collection.mutable.Buffer.empty[Int]
    val fetchOrgRepos: GiteeSource.OrgReposFetcher = (org, page, perPage) => {
      assert(org === "myorg" && perPage === 2)
      orgRepoCalls += page
      if (page == 1) Seq(
        """{"id":201,"full_name":"myorg/a","created_at":"2021-01-01T00:00:00Z"}""",
        """{"id":202,"full_name":"myorg/b","created_at":"2021-01-02T00:00:00Z"}""")
      else Seq("""{"id":203,"full_name":"myorg/c","created_at":"2021-01-03T00:00:00Z"}""")
    }

    val dim = GiteeSource.buildOrgsRepos(spark, Some(existing),
      repos = Seq("o/r", "o/new", "o/bad"), orgs = Seq("myorg"),
      fetchMeta = fetchMeta, fetchOrgRepos = fetchOrgRepos,
      parseOrgs = true, perPage = 2)

    val byName = dim.collect()
      .map(r => r.getAs[String]("name") -> r.getAs[String]("type")).toMap
    assert(byName === Map(
      "o/r" -> "repo", "o/new" -> "repo", "myorg" -> "org",
      "myorg/a" -> "repo", "myorg/b" -> "repo", "myorg/c" -> "repo"))
    // already-known names are not re-fetched (the missing-filter of
    // gitee_importer.ts:324-327); pagination stopped after the short page
    assert(!metaCalls.exists(_._1 == "o/r"))
    assert(orgRepoCalls.toSeq === Seq(1, 2))

    // idempotent: building again over the result inserts nothing new
    val again = GiteeSource.buildOrgsRepos(spark, Some(dim),
      repos = Seq("o/r", "o/new"), orgs = Seq("myorg"), fetchMeta = fetchMeta)
    assert(again.count() === dim.count())
  }
}
