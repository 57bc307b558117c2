package graft
import org.apache.spark.sql.types._
object SepProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[2]")
    spark.sparkContext.setLogLevel("ERROR")
    val conf = new org.apache.hadoop.conf.Configuration(spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", "|")
    val recs = spark.sparkContext.newAPIHadoopFile("/tmp/trailsep",
      classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
      classOf[org.apache.hadoop.io.LongWritable], classOf[org.apache.hadoop.io.Text], conf)
      .map(_._2.toString).collect()
    println("records=" + recs.map(r => s"[$r]").mkString(","))
  }
}
