package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** End-to-end corpus materialization: filters, dedup, split labels,
  * packing, and the partitioned layout contract. */
class CorpusWriterSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus() = {
    val good = (0L until 40L).map { i =>
      (i, s"the quick brown fox number $i jumps over the lazy dog and runs", "en")
    }
    val dup = Seq((100L, good(3)._2, "en"))          // exact dup of doc 3
    val junk = Seq((101L, "!!! ??? !!! ??? !!!", "en"), // punctuation soup
      (102L, "spam spam spam spam spam spam spam spam", "en")) // bigram loop
    (good ++ dup ++ junk).toDF("doc_id", "text", "lang")
  }

  test("write: filters junk, drops dups, labels splits, packs, partitioned layout") {
    val dir = java.nio.file.Files.createTempDirectory("corpus").toString + "/out"
    val back = CorpusWriter.write(corpus(), dir,
      minQuality = 0.4, maxDupBigram = 0.5,
      splits = Seq("train" -> 0.75, "val" -> 0.25), budget = 64L)

    val ids = back.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(100L), "exact dup should be dropped")
    assert(!ids.contains(101L), "punctuation soup should fail quality gate")
    assert(!ids.contains(102L), "bigram loop should fail repetition gate")
    assert(ids == (0L until 40L).toSet)

    // physical layout: split dirs exist and carry the partition columns
    val root = new java.io.File(dir)
    val splitDirs = root.listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(splitDirs.exists(_.startsWith("split=train")))
    // quality provenance travels with the corpus
    assert(back.columns.toSet ==
      Set("doc_id", "text", "lang", "quality_score", "dup_bigram_frac",
        "n_tokens", "cum_tokens", "shard_id", "split"))

    // packing invariant holds per (split, lang) after the roundtrip
    back.select("split", "lang", "cum_tokens", "n_tokens", "shard_id")
      .as[(String, String, Long, Long, Long)].collect()
      .foreach { case (_, _, cum, n, shard) =>
        assert((cum - n) / 64L == shard)
      }

    // deterministic: a second write of the same input is identical
    val dir2 = java.nio.file.Files.createTempDirectory("corpus2").toString + "/out"
    val back2 = CorpusWriter.write(corpus(), dir2, minQuality = 0.4,
      maxDupBigram = 0.5, splits = Seq("train" -> 0.75, "val" -> 0.25), budget = 64L)
    assert(back.except(back2).count() == 0 && back2.except(back).count() == 0)
  }
}
