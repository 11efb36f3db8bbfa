package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 stage breakdown of q_rec_eval (the heaviest honest lane,
  * close 6.8 s / floor 5.4 s): where does the time actually go —
  * basket distinct, train split, co-occurrence pair build, rank window,
  * or the eval joins? Guide §1.1: measure before touching. Each stage is
  * timed via the noop sink, min of `iters`, on the bench's own input
  * (orders x lineitem at $SPARK_GRAFT_SF_DIR). */
object ProbeRecEval {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.registerAll(spark)
    import graft.sources.Tables

    def baskets() = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))

    def timeIt(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to iters).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"probe:$name")
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-28s min ${ts.min}%6.3f  all ${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // the lane as shipped
    timeIt("full_recommendationEval") {
      graft.operators.Graph.recommendationEval(baskets(), "cust", "supp")
    }
    // stage: the distinct basket relation
    timeIt("b_distinct") {
      baskets().select(col("cust").as("basket"), col("supp").as("item")).distinct()
    }
    // stage: train split (b persisted like the lane does)
    timeIt("train_split") {
      val b = baskets().select(col("cust").as("basket"), col("supp").as("item"))
        .distinct().persist()
      val elig = b.groupBy("basket")
        .agg(count(lit(1)).as("n"), max(col("item")).as("held"))
        .filter(col("n") >= 2L).select("basket", "held")
      b.join(elig, Seq("basket"), "left")
        .filter(col("held").isNull || col("item") =!= col("held"))
        .select("basket", "item")
    }
    // stage: co-occurrence pair table on the train relation (the CF build)
    timeIt("co_edges_on_train") {
      val b = baskets().select(col("cust").as("basket"), col("supp").as("item"))
        .distinct().persist()
      val elig = b.groupBy("basket")
        .agg(count(lit(1)).as("n"), max(col("item")).as("held"))
        .filter(col("n") >= 2L).select("basket", "held")
      val train = b.join(elig, Seq("basket"), "left")
        .filter(col("held").isNull || col("item") =!= col("held"))
        .select("basket", "item").persist()
      graft.operators.Graph.coOccurrenceEdges(train, "basket", "item")
    }
    // stage: full recommendations(train) — adds the second distinct inside
    // coState, the count joins and the rank window on top of co_edges
    timeIt("recommendations_on_train") {
      val b = baskets().select(col("cust").as("basket"), col("supp").as("item"))
        .distinct().persist()
      val elig = b.groupBy("basket")
        .agg(count(lit(1)).as("n"), max(col("item")).as("held"))
        .filter(col("n") >= 2L).select("basket", "held")
      val train = b.join(elig, Seq("basket"), "left")
        .filter(col("held").isNull || col("item") =!= col("held"))
        .select("basket", "item").persist()
      graft.operators.Graph.recommendations(train, "basket", "item")
    }
    // window isolation: the scored CF relation with vs without the rank
    // window — bounds the win available to a bounded-heap top-k swap
    def scoredCf(): DataFrame = {
      val b = baskets().select(col("cust").as("basket"), col("supp").as("item"))
        .distinct().persist()
      val itemCnt = b.groupBy("item").agg(count(lit(1)).as("cnt"))
      val co = graft.operators.Graph.coOccurrenceEdges(b, "basket", "item")
      val sym = co.unionAll(co.select(
        col("item_b").as("item_a"), col("item_a").as("item_b"), col("co_cnt")))
      val ca = itemCnt.select(col("item").as("item_a"), col("cnt").as("cnt_a"))
      val cb = itemCnt.select(col("item").as("item_b"), col("cnt").as("cnt_b"))
      sym.join(broadcast(ca), "item_a").join(broadcast(cb), "item_b")
        .withColumn("cosine", col("co_cnt").cast("double") /
          sqrt((col("cnt_a") * col("cnt_b")).cast("double")))
    }
    timeIt("scored_no_window") { scoredCf() }
    timeIt("scored_with_window") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("item_a")
        .orderBy(col("cosine").desc, col("item_b").asc)
      scoredCf().withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
    }
    spark.stop()
  }
}
