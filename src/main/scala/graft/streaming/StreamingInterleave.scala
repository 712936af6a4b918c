package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming source-stratified epoch-interleave key — p17 maintained
  * at INGEST cadence: per group (source) the state is ONE long (the
  * count of documents ranked so far), and every arriving document is
  * assigned its src_rank and round-robin interleave key the moment it
  * lands, instead of by a corpus-wide batch rank.
  *
  * Equal to the batch operator iff documents arrive in md5(doc_id)
  * order per source — the ingest contract the gate pins with ordered
  * md5-prefix file splits; within one micro-batch a group's rows sort
  * by (mk, doc_id) before folding (the file source does not preserve
  * row order). The source dictionary is a bounded static collect
  * (the s03 pattern) passed in as the index map — at 100 TB it is a
  * dimension table refreshed at source-onboarding cadence, never
  * derived from the stream.
  *
  * Scale shape: state is exactly one long per source (the r66
  * counter-per-group class, the smallest in the streaming family) and
  * output is append-only — a rank counter only grows, so no placement
  * is ever revised. A checkpoint restart that reset the counter would
  * shift every post-restart key, which the batch-p17 oracle catches.
  */
object StreamingInterleave {
  case class DocSrc(source: String, doc_id: Long, mk: String)
  case class Keyed(doc_id: Long, source: String, src_rank: Long,
      interleave_key: Long)

  def keys(docs: Dataset[DocSrc],
      srcIdx: Map[String, Int]): Dataset[Keyed] = {
    import docs.sparkSession.implicits._
    val n = srcIdx.size.toLong
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[Long, Keyed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[DocSrc], state: GroupState[Long]) =>
          var rank = state.getOption.getOrElse(0L)
          val idx = srcIdx(source).toLong
          val out = rows.toSeq.sortBy(d => (d.mk, d.doc_id)).map { d =>
            rank += 1
            Keyed(d.doc_id, source, rank, (rank - 1) * n + idx)
          }
          state.update(rank)
          out.iterator
      }
  }
}
