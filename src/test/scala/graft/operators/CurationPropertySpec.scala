package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized (seeded) whole-corpus properties for the curation
  * operators: each property evaluates ONE Spark job over hundreds of
  * generated documents and checks the per-row invariants against an
  * independent Scala evaluation — exhaustive within the batch, cheap in
  * job count. */
class CurationPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)
  private val docs: Seq[(Long, String)] = (0 until 300).map { i =>
    val n = rnd.nextInt(200) // 0..199 tokens, includes empty docs
    (i.toLong, (0 until n).map(j => s"w${rnd.nextInt(50)}j$j").mkString(" "))
  }

  test("chunkDocs: every parameterization covers, overlaps, and counts exactly") {
    val df = docs.toDF("doc_id", "text")
    for ((max, ov) <- Seq((60, 10), (32, 0), (17, 16))) {
      val step = max - ov
      val out = Packing.chunkDocs(df, "text", "doc_id", max, ov)
        .collect().groupBy(_.getLong(0))
      docs.foreach { case (id, text) =>
        val toks = text.split(" ").toSeq match {
          case Seq("") => Seq("") // split of empty string yields one empty token
          case t => t
        }
        val n = toks.length
        val expectChunks = math.max(1L, (n - ov + step - 1L) / step)
        val chunks = out.getOrElse(id, Array.empty).sortBy(_.getLong(1))
        assert(chunks.length == expectChunks, s"doc $id ($n tokens) @($max,$ov)")
        chunks.zipWithIndex.foreach { case (r, i) =>
          val start = i * step
          val expect = toks.slice(start, start + max)
          assert(r.getString(3) == expect.mkString(" "),
            s"doc $id chunk $i @($max,$ov)")
          assert(r.getLong(2) == expect.length)
        }
      }
    }
  }

  test("hashSplitAssign matches an independent md5 evaluation on every row") {
    val cuts = Seq(("train", 0.8), ("val", 0.9))
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"), Sampling.hashSplitAssign(col("text"), cuts, "test")
        .as("split"))
      .as[(Long, String)].collect().toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    docs.foreach { case (id, text) =>
      val hex = md.digest(text.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      val expect =
        if (hex < Sampling.thresholdFor(0.8)) "train"
        else if (hex < Sampling.thresholdFor(0.9)) "val"
        else "test"
      assert(got(id) == expect, s"doc $id: ${got(id)} != $expect")
    }
  }

  test("capPerGroup equals the per-group sort-and-take reference") {
    val rows = (0 until 500).map { i =>
      (i.toLong, s"g${i % 9}", rnd.nextInt(40))
    }
    val df = rows.toDF("id", "grp", "score")
    val got = Sampling.capPerGroup(df, col("grp"), 7,
        Seq(col("score").desc, col("id").asc))
      .select("id").as[Long].collect().toSet
    val want = rows.groupBy(_._2).values.flatMap { g =>
      g.sortBy(r => (-r._3, r._1)).take(7).map(_._1)
    }.toSet
    assert(got == want)
  }
}
