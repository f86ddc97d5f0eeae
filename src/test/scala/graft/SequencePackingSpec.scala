package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SequencePacking

/** Invariants of the sequence-packing operator family on synthetic counts. */
class SequencePackingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val L = 100
  private val Shards = 4

  // deterministic counts in [1, 150] — some docs exceed L on purpose
  private def counts = spark.range(1000).select(
    col("id").as("doc_id"),
    (pmod(col("id") * 37 + 11, lit(150)) + 1).as("n_tok"))

  test("packChunked conserves tokens and keeps offsets in [0, seqLen)") {
    val p = SequencePacking.packChunked(counts, "doc_id", "n_tok", L, Shards).cache()
    assert(p.count() == 1000)
    val bad = p.filter(col("seq_off") < 0 || col("seq_off") >= L ||
      col("last_seq") < col("first_seq")).count()
    assert(bad == 0)
    // each shard's sequence-id range is [base, base + ceil(tokens/L)) and the
    // global ids are dense 0..total-1 across shards
    val nSeq = p.agg(max("last_seq")).head.getLong(0) + 1
    val totalTok = p.agg(sum("n_tok")).head.getLong(0)
    assert(nSeq >= totalTok / L && nSeq <= totalTok / L + Shards,
      s"$nSeq sequences for $totalTok tokens")
    // a doc's span length matches its token count: crossing k boundaries
    // means last_seq - first_seq = k
    val spans = p.filter(col("n_tok") > L).filter(col("last_seq") === col("first_seq")).count()
    assert(spans == 0, "an oversized doc must span at least two sequences")
  }

  test("packGreedy never splits a doc and never overfills a multi-doc sequence") {
    val p = SequencePacking.packGreedy(counts, "doc_id", "n_tok", L, Shards).cache()
    assert(p.count() == 1000)
    val fills = p.groupBy("seq").agg(sum("n_tok").as("fill"), count(lit(1)).as("nd"))
    // a sequence over L tokens can only be a single oversized doc
    assert(fills.filter(col("fill") > L && col("nd") > 1).count() == 0)
    // sequence ids dense across shards: 0..max with no gaps
    val ids = fills.select("seq").orderBy("seq").collect().map(_.getLong(0))
    assert(ids.head == 0L && ids.last == ids.length - 1L, "global seq ids must be dense")
    // deterministic: same input -> same packing
    val again = SequencePacking.packGreedy(counts, "doc_id", "n_tok", L, Shards)
    assert(p.exceptAll(again).count() == 0 && again.exceptAll(p).count() == 0)
  }

  test("packGreedy matches a reference Scala fold (linear kernel, one big shard)") {
    // 20k docs in ONE shard: the O(n) kernel is instant; the old Catalyst
    // aggregate fold copied O(n^2) accumulator elements here
    val n = 20000
    val toks = Array.tabulate(n)(i => (i.toLong * 37 + 11) % 150 + 1)
    val df = spark.range(n).select(col("id").as("doc_id"),
      (pmod(col("id") * 37 + 11, lit(150)) + 1).as("n_tok"))
    val got = SequencePacking.packGreedy(df, "doc_id", "n_tok", L, 1)
      .orderBy("doc_id").select("seq").collect().map(_.getLong(0))
    var fill = 0L; var bin = -1L
    val want = toks.map { t =>
      if (bin >= 0 && fill + t <= L) fill += t else { bin += 1; fill = t }
      bin
    }
    assert(got.toSeq == want.toSeq)
  }

  test("maxDocsPerSeq closes a sequence after k docs even when more fit") {
    val s = spark
    import s.implicits._
    // five 10-token docs all fit 100; cap 2 forces bins [0,0,1,1,2]
    val df = Seq((0L, 10L), (1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L))
      .toDF("doc_id", "n_tok")
    val p = SequencePacking.packGreedy(df, "doc_id", "n_tok", 100, 1, maxDocsPerSeq = 2)
      .orderBy("doc_id").collect().map(_.getLong(3))
    assert(p.toSeq == Seq(0L, 0L, 1L, 1L, 2L))
    // and the cap holds under the synthetic mix too
    val capped = SequencePacking.packGreedy(counts, "doc_id", "n_tok", L, Shards,
      maxDocsPerSeq = 3)
    val over = capped.groupBy("seq").agg(count(lit(1)).as("nd"))
      .filter(col("nd") > 3).count()
    assert(over == 0)
  }

  test("zero-token documents are dropped, not packed into nonsense rows") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, 5L), (1L, 0L), (2L, 7L)).toDF("doc_id", "n_tok")
    val c = SequencePacking.packChunked(df, "doc_id", "n_tok", 10, 1)
    assert(c.count() == 2 &&
      c.filter(col("last_seq") < col("first_seq")).count() == 0)
    val g = SequencePacking.packGreedy(df, "doc_id", "n_tok", 10, 1)
    assert(g.count() == 2)
  }

  test("greedy packs in doc_id order within a shard (next-fit, not first-fit)") {
    val s = spark
    import s.implicits._
    // one shard; docs 60,60,50,30: next-fit -> [60], then 60 opens bin1,
    // 30 joins bin1 (60+30<=100), 50 opens bin2... order is doc_id: 60,60,50,30
    val df = Seq((0L, 60L), (1L, 60L), (2L, 50L), (3L, 30L)).toDF("doc_id", "n_tok")
    val p = SequencePacking.packGreedy(df, "doc_id", "n_tok", 100, 1)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(3))
    // doc0 opens seq0 (60); doc1 doesn't fit (120>100) -> seq1 (60);
    // doc2 doesn't fit (110>100) -> seq2 (50); doc3 fits (80<=100) -> seq2
    assert(p.toSeq == Seq(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 2L), p.mkString(","))
  }
}
