package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming concat-and-chunk placement — the p16 example-boundary map
  * maintained at INGEST cadence: per group (lang) the state is ONE
  * long (the running token offset of the packed stream), and every
  * arriving document is assigned its (offset, first/last example) span
  * the moment it lands, instead of by a corpus-wide batch window.
  *
  * Equal to the batch operator iff documents arrive in doc_id order
  * per group — the ingest contract the gate pins with ordered file
  * splits; within one micro-batch a group's rows sort by doc_id
  * before folding (the file source does not preserve row order).
  *
  * Scale shape: state is exactly one long per group — the smallest
  * state in the engine's streaming family (r53 holds a row per KEY,
  * r64 a sketch per source; this holds a counter per shard group) —
  * and output is append-only: each doc's placement emits exactly once,
  * never revised, because a running offset only grows.
  */
object StreamingPacking {
  case class DocTok(lang: String, doc_id: Long, n_tokens: Long)
  case class Placement(lang: String, doc_id: Long, n_tokens: Long,
      start_off: Long, first_example: Long, last_example: Long)

  def placements(docs: Dataset[DocTok],
      exampleTokens: Int): Dataset[Placement] = {
    import docs.sparkSession.implicits._
    val c = exampleTokens.toLong
    docs.groupByKey(_.lang)
      .flatMapGroupsWithState[Long, Placement](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (lang: String, rows: Iterator[DocTok], state: GroupState[Long]) =>
          var off = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            val p = Placement(lang, d.doc_id, d.n_tokens, off,
              off / c, (off + d.n_tokens - 1) / c)
            off += d.n_tokens
            p
          }
          state.update(off)
          out.iterator
      }
  }
}
