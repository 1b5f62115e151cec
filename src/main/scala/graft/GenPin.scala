package graft

import org.apache.spark.sql.SparkSession

/** Regeneration tool for [[graft.queries.ExtractLinksPin]]: dumps the
  * extractLinks result as Scala tuple literals. Re-run (and paste into the
  * pin) only when Synth or the extraction kernel semantics legitimately
  * change — any other diff vs the committed pin is a regression. */
object GenPin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.queries.Queries.extractLinks(spark, "")
    def q(v: String): String = if (v == null) "null" else "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    df.collect().foreach { r =>
      println(s"    (${q(r.getString(0))}, ${q(r.getString(1))}, ${q(r.getString(2))}, ${q(r.getString(3))}, ${q(r.getString(4))}),")
    }
    spark.stop()
  }
}
