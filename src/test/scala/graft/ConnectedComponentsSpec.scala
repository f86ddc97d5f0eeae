package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** ground truth: union-find on the driver */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def check(edges: Seq[(Long, Long)], maxRounds: Int): Int = {
    val s = spark
    import s.implicits._
    val (cc, rounds) = ConnectedComponents.alternatingStar(edges.toDF("u", "v"))
    val got = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = unionFind(edges)
    assert(got == want, s"components mismatch; got=${got.toSeq.sorted.take(20)} want=${want.toSeq.sorted.take(20)}")
    assert(rounds <= maxRounds, s"took $rounds rounds (> $maxRounds)")
    rounds
  }

  test("random graph matches union-find ground truth") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(e => e._1 != e._2)
    check(edges, maxRounds = 12)
  }

  test("300-node chain converges in O(log n) rounds, not O(diameter)") {
    val chain = (0L until 299L).map(i => (i, i + 1))
    val rounds = check(chain, maxRounds = 15)
    assert(rounds < 15, s"chain should need ~log2(300)=9ish rounds, took $rounds")
  }

  test("disjoint cliques keep distinct components") {
    val cliqueA = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val cliqueB = for (i <- 10L to 13L; j <- (i + 1) to 13L) yield (i, j)
    check(cliqueA ++ cliqueB, maxRounds = 6)
  }
}
