package graft

import org.apache.spark.sql.SparkSession

import graft.operators.NearDup
import graft.sources.Tables

/** Dev tool: stage-by-stage timing of the near-dup pipeline at a given SF.
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ProfileNearDup"` */
object ProfileNearDup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.documents(spark, sfDir)
    time("warmup")(noop(spark.range(1000).selectExpr("sum(id) s")))
    // focused mode for the sf1 probe: only the jaccardJoin stage split
    // (the full minhash/collapsed sections cost minutes at 10x data)
    if (sys.env.get("SPARK_GRAFT_PROFILE_ONLY").contains("jj")) {
      val (sigs2, prefixes, cand) = NearDup.jaccardStages(docs, 0.5)
      time("jj: signatures (ckpt)")(noop(sigs2))
      time("jj: prefixes")(noop(prefixes))
      time("jj: candidates")(noop(cand))
      println("jj candidate pairs (post all filters): " + cand.count())
      time("jj: verify")(noop(NearDup.jaccardVerify(cand, sigs2)
        .filter(org.apache.spark.sql.functions.col("jaccard") >= 0.5)))
      spark.stop(); return
    }
    time("shingles only")(noop(docs.select(NearDup.shingles(
      org.apache.spark.sql.functions.col("text")).as("sh"))))
    time("signatures")(noop(NearDup.signatures(docs)))
    val sigs = NearDup.signatures(docs)
    time("lshCandidates")(noop(NearDup.lshCandidates(sigs)))
    time("verify (minhash full)")(noop(NearDup.minhashPairs(docs, 0.5)))
    time("jaccardJoin full")(noop(NearDup.jaccardJoin(docs, 0.5)))
    println("lsh candidate pairs: " + NearDup.lshCandidates(sigs).count())
    // internal split of jaccardJoin — the REAL stages (jaccardStages), each
    // incremental on the previous via the checkpointed signature table
    locally {
      val (sigs2, prefixes, cand) = NearDup.jaccardStages(docs, 0.5)
      time("jj: signatures (ckpt)")(noop(sigs2))
      time("jj: prefixes")(noop(prefixes))
      time("jj: candidates")(noop(cand))
      time("jj: verify")(noop(NearDup.jaccardVerify(cand, sigs2)))
      println("jj candidate pairs (post length+positional filter): " + cand.count())
    }
    // collapsed-path internals (mirrors jaccardJoin's private pipeline — a
    // deliberate debugging copy; keep in sync when the operator changes)
    locally {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      val sigs = NearDup.signatures(docs).select("doc_id", "sh").localCheckpoint()
      println(f"cj: sigs eager ckpt        ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      val members = sigs.select(col("doc_id"),
        md5(concat_ws("", col("sh"))).as("__fp"), size(col("sh")).as("__n"))
      val reps = members.groupBy("__fp").agg(min("doc_id").as("doc_id"))
      val t1 = System.nanoTime()
      val repSigs = sigs.join(reps.select("doc_id"), "doc_id").localCheckpoint()
      println(f"cj: repSigs eager ckpt     ${(System.nanoTime() - t1) / 1e9}%6.2f s")
      val repPairs = NearDup.jaccardVerify(
          NearDup.candidatesForProfiling(repSigs, 0.5), repSigs)
        .filter(col("jaccard") >= 0.5)
        .select("a_id", "b_id", "jaccard")
      time("cj: repPairs")(noop(repPairs))
      val x = members.alias("x"); val y = members.alias("y")
      val within = x.join(y,
          col("x.__fp") === col("y.__fp") &&
          col("x.doc_id") < col("y.doc_id") && col("x.__n") > 0)
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
          lit(1.0).as("jaccard"))
      val crossed = repPairs
        .join(members.select(col("doc_id").as("a_id"), col("__fp").as("__fpa")), "a_id")
        .join(members.select(col("doc_id").as("b_id"), col("__fp").as("__fpb")), "b_id")
        .join(members.select(col("doc_id").as("ax"), col("__fp").as("__fpa")), "__fpa")
        .join(members.select(col("doc_id").as("bx"), col("__fp").as("__fpb")), "__fpb")
        .select(least(col("ax"), col("bx")).as("a_id"),
          greatest(col("ax"), col("bx")).as("b_id"), col("jaccard"))
      time("cj: union+sort (full)")(noop(within.unionByName(crossed).orderBy("a_id", "b_id")))
    }
    spark.stop()
  }
}
