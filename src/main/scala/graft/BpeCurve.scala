package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Opt-in BPE trainer scale-curve harness (the committed recipe behind
  * tools/bpe-scale.md): trains the batched phrase-level BPE to each target
  * in SPARK_GRAFT_BPE_TARGETS over SPARK_GRAFT_BPE_DIR's documents table
  * and prints one line per target (merges, rounds, wall, corpus sizes)
  * plus an encode-parity line at the largest vocab. Mirrors
  * BpeScaleSpec's opt-in test exactly; exists as a main so multi-hour
  * 16k-32k runs can go through spark-submit on the packaged jar instead
  * of holding the sbt test lock. Run:
  *
  *   SPARK_GRAFT_BPE_TARGETS=16384 SPARK_GRAFT_BPE_DIR=/root/testdata/sf0.1 \
  *   SPARK_GRAFT_BPE_CPUS=16 /opt/spark/bin/spark-submit \
  *     --class graft.BpeCurve target/scala-2.13/<jar>
  */
object BpeCurve {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_BPE_CPUS", "16")
    val dir = sys.env.getOrElse("SPARK_GRAFT_BPE_DIR", "/root/testdata/sf0.1")
    val targets = sys.env.getOrElse("SPARK_GRAFT_BPE_TARGETS", "16384")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.sources.Tables.load(spark, dir, "documents")
      .groupBy(col("text")).agg(count(lit(1)).as("wc"))
      .select(expr("filter(split(text, ' '), x -> length(x) >= 1)").as("syms"),
        col("wc"))
    val curve = targets.map { target =>
      val batchM = math.max(48, target / 64)
      val t0 = System.nanoTime()
      val (merges, totals) = graft.queries.DataQueries9.bpeBatchTrain(base,
        batchK = 8192, batchM = batchM, maxRounds = 200, targetMerges = target)
      val wall = (System.nanoTime() - t0) / 1e9
      val rounds = merges.map(_._1).max
      println(f"BPE_CURVE target=$target merges=${merges.size} rounds=$rounds " +
        f"batchM=$batchM ceil=${(target + batchM - 1) / batchM} wall=$wall%.1f " +
        s"corpus=${totals.head._2}->${totals.last._2}")
      // per-round acceptance profile: how many disjoint merges each round's
      // greedy sweep actually took (the number that decides whether rounds
      // track target/batchM or the corpus's disjoint-merge width)
      val byRound = merges.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (r, ms) => s"$r:${ms.size}" }
      println(s"BPE_ACCEPT target=$target " + byRound.mkString(","))
      (target, merges, totals)
    }
    val (bigT, bigMerges, bigTotals) = curve.last
    val mergeArr = array(bigMerges.map(m => lit(m._3)): _*)
    val t1 = System.nanoTime()
    val total = graft.sources.Tables.load(spark, dir, "documents")
      .select(size(graft.functions.prom.apply_merges_words(col("text"), mergeArr))
        .cast("long").as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    println(f"BPE_ENCODE target=$bigT total=$total trained=${bigTotals.last._2} " +
      f"match=${total == bigTotals.last._2} sec=${(System.nanoTime() - t1) / 1e9}%.2f")
    spark.stop()
  }
}
