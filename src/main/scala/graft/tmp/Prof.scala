package graft.tmp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](l: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"STAGE $l ${(System.nanoTime()-t0)/1e9}%.2f"); r }
    val sig = graft.ops.Dedup.simhashSignatures(spark, dir)
    time("sig-count")(sig.count())
    val sigC = sig.cache(); time("sig-cache")(sigC.count())
    val groups = sigC.groupBy(col("sig")).agg(sort_array(collect_list(col("doc_id"))).as("ids")).cache()
    time("groups")(groups.count())
    val bandCols = for { i <- 0 until 8; j <- i + 1 until 8; k <- j + 1 until 8 } yield
      struct(lit(i*64+j*8+k).as("band"), concat(substring(col("sig"),i*8+1,8), substring(col("sig"),j*8+1,8), substring(col("sig"),k*8+1,8)).as("bv"))
    val buckets = groups.select(col("sig"), explode(array(bandCols: _*)).as("bk")).select(col("sig"), col("bk.band"), col("bk.bv"))
    time("buckets")(buckets.count())
    val sigPairs = buckets.as("x").join(buckets.as("y"), Seq("band", "bv")).filter(col("x.sig") < col("y.sig")).select(col("x.sig").as("sa"), col("y.sig").as("sb")).distinct()
    val sp = time("sigPairs")(sigPairs.cache().count())
    val ham = sigPairs.withColumn("hamming", expr("CAST(size(filter(sequence(1, 64), k -> substring(sa, k, 1) <> substring(sb, k, 1))) AS INT)")).filter(col("hamming") <= 3)
    time("hamming")(ham.count())
    println("sigpairs=" + sp)
    spark.stop()
  }
}
