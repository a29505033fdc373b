package graft.streaming

import graft.engine.ValidationEngine
import graft.spec.SchemaSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming forms of the validation engine.
  *
  * The fused constraint projection is stateless, so
  * [[ValidationEngine.annotate]] applies to a streaming DataFrame
  * unchanged (readStream → annotate → writeStream). What streams add is
  * state: watermarked windowed violation rollups and exact streaming
  * dedup, both below.
  */
object StreamingValidation {

  /** Row-level validation of a stream: same fused projection as batch. */
  def annotate(stream: DataFrame, spec: SchemaSpec): DataFrame =
    ValidationEngine.annotate(stream, spec)

  /** Windowed per-constraint violation counts with a watermark: emits
    * `(window, constraint_id, n)` per event-time window, late data beyond
    * the watermark dropped. Output mode: update/append per sink choice.
    */
  def violationCountsByWindow(stream: DataFrame, spec: SchemaSpec,
      timeCol: String, windowDur: String, watermarkDelay: String): DataFrame =
    ValidationEngine.annotate(stream, spec)
      .withWatermark(timeCol, watermarkDelay)
      .where(!col(ValidationEngine.PassCol))
      .select(col(timeCol), explode(col(ValidationEngine.ViolationsCol)).as("v"))
      .groupBy(window(col(timeCol), windowDur), col("v.constraint_id").as("constraint_id"))
      .agg(count(lit(1)).as("n"))

  /** Exact streaming dedup on a key within the watermark horizon —
    * Spark's stateful dropDuplicates keeps one state entry per key until
    * the watermark passes (bounded state; the streaming analog of the
    * batch uniqueness check).
    */
  def dedupStream(stream: DataFrame, keyCol: String,
      timeCol: String, watermarkDelay: String): DataFrame =
    stream
      .withWatermark(timeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Per-source running verdict counts (update-mode aggregation):
    * `(source, n_rows, n_failed)` maintained incrementally.
    */
  def runningVerdicts(stream: DataFrame, spec: SchemaSpec, partCol: String): DataFrame =
    ValidationEngine.annotate(stream, spec)
      .groupBy(col(partCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(ValidationEngine.PassCol), 0L).otherwise(1L)).as("n_failed"))
}
