package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Randomized parity: the histogram/prefix-sum AUC must agree with the
  * textbook O(P·N) pairwise definition (1 per concordant pair, 0.5 per
  * tie) on arbitrary small integer scores — heavy ties are the regime
  * where midrank bookkeeping drifts. Comparison at 2e-6 (the operator
  * rounds to 6 dp; the reference is unrounded). */
class AucPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def refAuc(rows: Seq[(Long, Boolean)]): Double = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    if (pos.isEmpty || neg.isEmpty) 0.5
    else {
      var s = 0.0
      for (p <- pos; n <- neg)
        s += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
      s / (pos.size.toDouble * neg.size.toDouble)
    }
  }

  test("aucRoc matches brute-force pairwise AUC on random tied data") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 20) {
      val n = 1 + rnd.nextInt(60)
      val maxScore = 1 + rnd.nextInt(8) // tiny domain => heavy ties
      val rows = Seq.fill(n)((rnd.nextInt(maxScore).toLong, rnd.nextBoolean()))
      val got = Evaluation.aucRoc(rows.toDF("s", "y"), $"s", $"y")
        .select("auc").as[Double].head()
      assert(math.abs(got - refAuc(rows)) < 2e-6,
        s"trial $trial diverges: n=$n maxScore=$maxScore rows=$rows")
    }
  }

  test("aucRocBy matches brute-force AUC computed per group") {
    val rnd = new scala.util.Random(424242L)
    val rows = Seq.fill(120)(
      (s"g${rnd.nextInt(5)}", rnd.nextInt(6).toLong, rnd.nextBoolean()))
    val got = Evaluation.aucRocBy(rows.toDF("g", "s", "y"), $"g", $"s", $"y")
      .select("grp", "auc").as[(String, Double)].collect().toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      assert(math.abs(got(g) - refAuc(rs.map(t => (t._2, t._3)))) < 2e-6,
        s"group $g diverges")
    }
  }
}
