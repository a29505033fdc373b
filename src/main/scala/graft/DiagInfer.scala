package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-6 measurement harness for the val_infer_rows hotspot: times the
  * current SpecInfer.inferRows plan against reduced variants to locate
  * the cost (multi-distinct Expand vs collect_set vs plan shape), and a
  * candidate per-column union form. Measurement only — the production
  * path stays in SpecInfer.
  */
object DiagInfer {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .appName("diag-infer")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(mk: => DataFrame): Unit = {
      mk.write.mode("overwrite").format("noop").save() // warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[diaginfer] $name%-28s min=${ts.head}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val fields = df.schema.fields

    // 1. current production form
    time("current")(engine.SpecInfer.inferRows(df))

    // 2. current minus collect_set
    time("no_collect_set") {
      val aggs = count(lit(1)).as("_n") +: fields.toSeq.flatMap { f =>
        val c = col(f.name)
        Seq(sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
          min(c).cast("string").as(s"${f.name}__min"),
          max(c).cast("string").as(s"${f.name}__max"),
          countDistinct(c).as(s"${f.name}__dist"))
      }
      df.agg(aggs.head, aggs.tail: _*)
    }

    // 3. current minus countDistinct (keeps collect_set)
    time("no_count_distinct") {
      val aggs = count(lit(1)).as("_n") +: fields.toSeq.flatMap { f =>
        val c = col(f.name)
        Seq(sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
          min(c).cast("string").as(s"${f.name}__min"),
          max(c).cast("string").as(s"${f.name}__max")) ++
        (if (f.dataType == StringType)
           Seq(array_join(sort_array(collect_set(c)), ",").as(s"${f.name}__set"))
         else Nil)
      }
      df.agg(aggs.head, aggs.tail: _*)
    }

    // 4. single countDistinct only (one distinct group)
    time("one_count_distinct") {
      df.agg(countDistinct(col("doc_id")).as("d"))
    }

    // 5. five countDistinct, nothing else
    time("five_count_distinct") {
      val aggs = fields.toSeq.map(f => countDistinct(col(f.name)).as(s"${f.name}__d"))
      df.agg(aggs.head, aggs.tail: _*)
    }

    // 6. per-column union form (candidate): group-by-value two-level agg
    time("per_column_union") {
      val parts = fields.toSeq.map { f =>
        val g = df.groupBy(col(f.name).as("_v")).agg(count(lit(1)).as("_cnt"))
        val isStr = f.dataType == StringType
        g.agg(
          sum(col("_cnt")).as("n"),
          sum(when(col("_v").isNull, col("_cnt")).otherwise(0L)).as("n_null"),
          min(col("_v")).cast("string").as("min_s"),
          max(col("_v")).cast("string").as("max_s"),
          count(col("_v")).as("n_distinct")) // non-null group keys
          .select(lit(f.name).as("col_name"), col("n"), col("n_null"),
            (col("n_null") === 0L).as("required"), col("min_s"), col("max_s"),
            col("n_distinct"),
            lit(null).cast("string").as("enum_vals"))
      }
      parts.reduce(_.unionAll(_))
    }

    // 7. candidate fix: the two aggregate families split into separate
    // subtrees (multi-distinct Expand never meets the TypedImperative
    // collect_set), recombined by a 1-row cross join
    def splitForm(df: DataFrame, enumMax: Int): DataFrame = {
      val fs = df.schema.fields.toSeq
      val basic = count(lit(1)).as("_n") +: fs.flatMap { f =>
        val c = col(f.name)
        Seq(sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
          min(c).cast("string").as(s"${f.name}__min"),
          max(c).cast("string").as(s"${f.name}__max"),
          countDistinct(c).as(s"${f.name}__dist"))
      }
      val setAggs = fs.filter(_.dataType == StringType).map(f =>
        array_join(sort_array(collect_set(col(f.name))), ",").as(s"${f.name}__set"))
      val wide0 = df.agg(basic.head, basic.tail: _*)
      val wide = if (setAggs.isEmpty) wide0
        else wide0.crossJoin(df.agg(setAggs.head, setAggs.tail: _*))
      val stacked = fs.map { f =>
        val enumCol =
          if (f.dataType == StringType)
            when(col(s"${f.name}__dist") <= enumMax, col(s"${f.name}__set"))
          else lit(null).cast("string")
        struct(
          lit(f.name).as("col_name"),
          col("_n").as("n"),
          col(s"${f.name}__nulls").as("n_null"),
          (col(s"${f.name}__nulls") === 0L).as("required"),
          col(s"${f.name}__min").as("min_s"),
          col(s"${f.name}__max").as("max_s"),
          col(s"${f.name}__dist").as("n_distinct"),
          enumCol.as("enum_vals"))
      }
      wide.select(explode(array(stacked: _*)).as("s")).select(col("s.*"))
    }
    time("split_crossjoin")(splitForm(df, 16))

    // identity check: split form ≡ current production form, row-for-row
    val cur = engine.SpecInfer.inferRows(df).collect().map(_.toString).sorted
    val neu = splitForm(df, 16).collect().map(_.toString).sorted
    println(s"[diaginfer] identity: rows=${cur.length}/${neu.length} equal=${cur.sameElements(neu)}")
    spark.stop()
  }
}
