package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join: attribute each purchase to
  * the clicks that preceded it within an attribution window — the
  * canonical two-unbounded-sides correlation (the batch surface has no
  * analogue: both inputs grow forever).
  *
  * Scale shape: the join keys on user_id, so both sides shuffle to
  * co-locate per-user state; the event-time interval condition plus
  * BOTH watermarks bound the buffered state — Spark evicts a row once
  * the other side's watermark passes the end of the interval it could
  * still match. Without the interval bound (or with only one
  * watermark) state grows without limit; this join is only
  * 100-TB-viable because the condition makes eviction provable.
  */
object StreamJoin {

  /** Inner attribution join.
    * @param clicks    streaming frame: (user_id, click_id, click_ts)
    * @param purchases streaming frame: (user_id, purchase_id, purchase_ts)
    * @param window    attribution horizon, e.g. "1 hour"
    * @param lateness  watermark horizon on both sides
    */
  def attribution(clicks: DataFrame, purchases: DataFrame,
      window: String = "1 hour", lateness: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("click_ts", lateness)
    val p = purchases.withWatermark("purchase_ts", lateness)
    c.join(p,
      c("user_id") === p("user_id") &&
        p("purchase_ts") >= c("click_ts") &&
        p("purchase_ts") <= c("click_ts") + expr(s"INTERVAL $window"),
      "inner")
      .select(c("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }
}
