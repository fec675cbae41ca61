package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-STREAM joins — the correlation front of a continuous pipeline
  * (ad attribution, request/response pairing, sensor fusion): two live
  * streams equi-join on a key with an EVENT-TIME interval condition, and
  * the watermarks bound both sides' join state — without the time bound,
  * a stream-stream join would have to buffer every row forever.
  *
  * State contract (Spark's): each side buffers rows until the other
  * side's watermark passes the interval's reach, then evicts — so state
  * size tracks `watermarkDelay + within` of traffic, not history. Inner
  * joins emit as soon as both rows arrive; matches farther apart than
  * `within` never emit.
  */
object StreamJoins {

  /** `left` rows joined to `right` rows with the same `keyCol` whose
    * `rightTs` falls in [leftTs, leftTs + within]. `within` is an SQL
    * interval string (e.g. "10 seconds"). Output keeps both sides under
    * aliases `l` / `r`.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, within: String,
      watermarkDelay: String): DataFrame = {
    require(left.isStreaming && right.isStreaming,
      "intervalJoin expects two streaming DataFrames (use a regular join otherwise)")
    left.withWatermark(leftTs, watermarkDelay).alias("l")
      .join(right.withWatermark(rightTs, watermarkDelay).alias("r"),
        expr(s"l.$keyCol = r.$keyCol AND " +
          s"r.$rightTs >= l.$leftTs AND r.$rightTs <= l.$leftTs + INTERVAL $within"))
  }
}
