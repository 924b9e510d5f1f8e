package graft.store

import graft.SparkTestBase
import graft.query.F
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** `\$transaction` options (maxWait / timeout / isolation,
  * prismaNamespace.ts:885-892) + the Prisma error-code taxonomy
  * (effect.ts:17-196). */
class TxnOptionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def freshCatalog(): Catalog =
    new Catalog(java.nio.file.Files.createTempDirectory("graft-txopt").toString)

  private val schema = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private def table(cat: Catalog): GraftTable =
    new GraftTable(spark, cat, "t", schema, uniqueKeys = Seq(Seq("id")))

  test("exceptions carry their Prisma error codes") {
    val cat = freshCatalog()
    val t = table(cat)
    t.createMany(Seq(("a", "1")).toDF("id", "v"))
    val dup = intercept[UniqueViolationException] {
      t.createMany(Seq(("a", "2")).toDF("id", "v"))
    }
    assert(dup.code == "P2002" && dup.getMessage.startsWith("[P2002]"))
    val nf = intercept[RecordNotFoundException] {
      t.update(F.eq("id", "zzz"), Map("v" -> lit("x")))
    }
    assert(nf.code == "P2025")
    val tx1 = new Txn(cat)
    tx1.createMany(t, Seq(("b", "1")).toDF("id", "v"), skipDuplicates = false)
    t.createMany(Seq(("c", "1")).toDF("id", "v"))
    val occ = intercept[ConcurrentModificationException] { tx1.commit() }
    assert(occ.code == "P2034")
  }

  test("NULL into a non-nullable column throws the P2011 equivalent") {
    val t = table(freshCatalog())
    val e = intercept[NullConstraintException] {
      t.createMany(Seq((null.asInstanceOf[String], "x")).toDF("id", "v"))
    }
    assert(e.code == "P2011")
    assert(t.snapshot().count() == 0)
  }

  test("maxWait: commit-lock acquisition is bounded (P2024)") {
    val cat = freshCatalog()
    val t = table(cat)
    // a stuck writer on ANOTHER thread holds the lock (same-thread lock
    // would just re-enter)
    val held = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() => {
      cat.commitLock.lock()
      held.countDown()
      release.await()
      cat.commitLock.unlock()
    })
    holder.start()
    held.await()
    try {
      val tx = new Txn(cat, TxnOptions(maxWaitMs = 150))
      tx.createMany(t, Seq(("a", "1")).toDF("id", "v"), skipDuplicates = false)
      val e = intercept[CommitWaitTimeoutException] { tx.commit() }
      assert(e.code == "P2024")
    } finally { release.countDown(); holder.join() }
    // once released, a fresh attempt commits fine
    t.createMany(Seq(("a", "1")).toDF("id", "v"))
    assert(t.snapshot().count() == 1)
  }

  test("timeout: the interactive closure is cancelled at the deadline (P2028)") {
    val cat = freshCatalog()
    val t = table(cat)
    val e = intercept[TransactionTimeoutException] {
      Txn.run(cat, TxnOptions(timeoutMs = 1200)) { tx =>
        // a Spark job that cannot finish in time — cancelled by job group
        val slow = spark.range(1000).repartition(8)
          .map { i => Thread.sleep(50); i }
        tx.createMany(t, slow.map(i => (s"id$i", "v")).toDF("id", "v"),
          skipDuplicates = false)
      }
    }
    assert(e.code == "P2028")
    assert(t.snapshot().count() == 0, "nothing published after timeout")
  }

  test("isolation levels are accepted and documented as mapped-up") {
    val cat = freshCatalog()
    val t = table(cat)
    IsolationLevel.values.foreach { lvl =>
      Txn.run(cat, TxnOptions(timeoutMs = 0, isolation = lvl)) { tx =>
        tx.upsert(t, Seq("id"), Seq(("iso", lvl.toString)).toDF("id", "v"))
      }
    }
    assert(t.snapshot().filter($"id" === "iso").count() == 1)
  }
}
