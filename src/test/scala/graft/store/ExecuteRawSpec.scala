package graft.store

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** `\$executeRaw` analog: raw SQL mutations parsed by Spark's own parser
  * and routed into the copy-on-write store statement surface. */
class ExecuteRawSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def freshCatalog(): Catalog =
    new Catalog(java.nio.file.Files.createTempDirectory("graft-execraw").toString)

  private def acctTable(cat: Catalog): GraftTable =
    new GraftTable(spark, cat, "acct", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("bal", DoubleType, nullable = true))),
      uniqueKeys = Seq(Seq("id")))

  test("INSERT VALUES, UPDATE with WHERE, DELETE round-trip") {
    val t = acctTable(freshCatalog())
    val tabs = Map("acct" -> t)
    val n1 = ExecuteRaw.execute(spark, tabs,
      "INSERT INTO acct VALUES (1, 'a', 10.0), (2, 'b', -5.0), (3, 'c', 100.0)")
    assert(n1 == 3)
    val n2 = ExecuteRaw.execute(spark, tabs,
      "UPDATE acct SET bal = bal * 2, name = 'big' WHERE bal > 50")
    assert(n2 == 1)
    val n3 = ExecuteRaw.execute(spark, tabs, "DELETE FROM acct WHERE bal < 0")
    assert(n3 == 1)
    val out = t.snapshot().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, "a", 10.0), (3L, "big", 200.0)))
  }

  test("INSERT with a column list defaults unnamed columns to NULL") {
    val t = acctTable(freshCatalog())
    val n = ExecuteRaw.execute(spark, Map("acct" -> t),
      "INSERT INTO acct (id, name) VALUES (7, 'x')")
    assert(n == 1)
    val r = t.snapshot().collect().head
    assert(r.getLong(0) == 7L && r.getString(1) == "x" && r.isNullAt(2))
  }

  test("INSERT INTO ... SELECT over a temp view is distributed end to end") {
    val t = acctTable(freshCatalog())
    Seq((10L, "p", 1.5), (11L, "q", 2.5)).toDF("k", "nm", "v")
      .createOrReplaceTempView("exec_raw_src")
    val n = ExecuteRaw.execute(spark, Map("acct" -> t),
      "INSERT INTO acct SELECT k, nm, v * 10 FROM exec_raw_src WHERE v > 2")
    assert(n == 1)
    assert(t.snapshot().collect().head.getDouble(2) == 25.0)
  }

  test("UPDATE SET a=b, b=a swaps against the pre-update row") {
    val cat = freshCatalog()
    val t = new GraftTable(spark, cat, "pair", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("a", LongType, nullable = true),
      StructField("b", LongType, nullable = true))),
      uniqueKeys = Seq(Seq("id")))
    t.createMany(Seq((1L, 10L, 20L)).toDF("id", "a", "b"))
    ExecuteRaw.execute(spark, Map("pair" -> t), "UPDATE pair SET a = b, b = a")
    val r = t.snapshot().collect().head
    assert(r.getLong(1) == 20L && r.getLong(2) == 10L)
  }

  test("batched statements stage in one transaction and publish atomically") {
    val t = acctTable(freshCatalog())
    val tabs = Map("acct" -> t)
    val ns = ExecuteRaw.executeMany(spark, tabs, Seq(
      "INSERT INTO acct VALUES (1, 'a', 1.0)",
      "UPDATE acct SET bal = 2.0 WHERE id = 1"))
    assert(ns == Seq(1L, 1L))
    assert(t.snapshot().collect().head.getDouble(2) == 2.0)
    // a failing statement in the batch publishes NOTHING
    intercept[Exception] {
      ExecuteRaw.executeMany(spark, tabs, Seq(
        "DELETE FROM acct WHERE id = 1",
        "INSERT INTO missing_table VALUES (9)"))
    }
    assert(t.snapshot().count() == 1) // the delete was rolled back
  }

  test("unique and FK machinery applies to raw statements") {
    val cat = freshCatalog()
    val t = acctTable(cat)
    ExecuteRaw.execute(spark, Map("acct" -> t),
      "INSERT INTO acct VALUES (1, 'a', 1.0)")
    intercept[UniqueViolationException] {
      ExecuteRaw.execute(spark, Map("acct" -> t),
        "INSERT INTO acct VALUES (1, 'dup', 2.0)")
    }
  }

  test("typo'd or duplicate column lists are errors, not silent NULLs") {
    val t = acctTable(freshCatalog())
    val e = intercept[IllegalArgumentException] {
      ExecuteRaw.execute(spark, Map("acct" -> t),
        "INSERT INTO acct (id, nam) VALUES (1, 'x')")
    }
    assert(e.getMessage.contains("unknown column nam"))
    intercept[IllegalArgumentException] {
      ExecuteRaw.execute(spark, Map("acct" -> t),
        "INSERT INTO acct (id, id) VALUES (1, 2)")
    }
    assert(t.snapshot().count() == 0)
  }

  test("duplicate SET targets are refused like Postgres, case-folded") {
    val t = acctTable(freshCatalog())
    val tabs = Map("acct" -> t)
    ExecuteRaw.execute(spark, tabs, "INSERT INTO acct VALUES (1, 'x', 1.0)")
    val e = intercept[IllegalArgumentException] {
      ExecuteRaw.execute(spark, tabs,
        "UPDATE acct SET bal = 2.0, BAL = 3.0 WHERE id = 1")
    }
    assert(e.getMessage.contains("multiple assignments"))
    assert(t.snapshot().collect().head.getDouble(2) == 1.0)
  }

  test("identifiers resolve case-insensitively to declared names") {
    val t = acctTable(freshCatalog())
    val tabs = Map("acct" -> t)
    assert(ExecuteRaw.execute(spark, tabs,
      "INSERT INTO Acct (ID, Name, BAL) VALUES (1, 'x', 3.0)") == 1)
    assert(ExecuteRaw.execute(spark, tabs,
      "UPDATE ACCT SET Bal = 4.0 WHERE id = 1") == 1)
    val r = t.snapshot().collect().head
    assert(r.getLong(0) == 1L && r.getDouble(2) == 4.0)
  }

  test("INSERT BY NAME maps by source column names, not position") {
    val t = acctTable(freshCatalog())
    val n = ExecuteRaw.execute(spark, Map("acct" -> t),
      "INSERT INTO acct BY NAME SELECT 5.5 AS bal, 7 AS id, 'x' AS name")
    assert(n == 1)
    val r = t.snapshot().collect().head
    assert(r.getLong(0) == 7L && r.getString(1) == "x" && r.getDouble(2) == 5.5)
  }

  test("tables spanning several catalogs are refused") {
    val a = acctTable(freshCatalog())
    val other = new GraftTable(spark, freshCatalog(), "other", StructType(Seq(
      StructField("id", LongType, nullable = false))), uniqueKeys = Seq(Seq("id")))
    val e = intercept[IllegalArgumentException] {
      ExecuteRaw.execute(spark, Map("acct" -> a, "other" -> other),
        "INSERT INTO other VALUES (1)")
    }
    assert(e.getMessage.contains("multiple catalogs"))
  }

  test("raw statements drive the full referential machinery") {
    val cat = freshCatalog()
    val parent = new GraftTable(spark, cat, "client", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true))),
      uniqueKeys = Seq(Seq("id")))
    val child = new GraftTable(spark, cat, "event", StructType(Seq(
      StructField("eid", LongType, nullable = false),
      StructField("client_id", LongType, nullable = true))),
      uniqueKeys = Seq(Seq("eid")))
    parent.onDeleteCascade(child, "client_id", "id")
    val tabs = Map("client" -> parent, "event" -> child)
    ExecuteRaw.executeMany(spark, tabs, Seq(
      "INSERT INTO client VALUES (1, 'a'), (2, 'b')",
      "INSERT INTO event VALUES (10, 1), (11, 1), (12, 2)"))
    // dangling FK through raw SQL is P2003
    intercept[ForeignKeyViolationException] {
      ExecuteRaw.execute(spark, tabs, "INSERT INTO event VALUES (13, 99)")
    }
    // ON UPDATE CASCADE: renaming the referenced key remaps children
    assert(ExecuteRaw.execute(spark, tabs,
      "UPDATE client SET id = 5 WHERE id = 1") == 1)
    assert(child.snapshot().filter(col("client_id") === 5L).count() == 2)
    // ON DELETE CASCADE through a raw DELETE drops the referencing rows
    assert(ExecuteRaw.execute(spark, tabs, "DELETE FROM client WHERE id = 5") == 1)
    assert(child.snapshot().count() == 1)
    assert(child.snapshot().head().getLong(0) == 12L)
  }

  test("non-mutation and unknown-table statements are refused") {
    val t = acctTable(freshCatalog())
    intercept[IllegalArgumentException] {
      ExecuteRaw.execute(spark, Map("acct" -> t), "SELECT * FROM acct")
    }
    intercept[IllegalArgumentException] {
      ExecuteRaw.execute(spark, Map("acct" -> t),
        "INSERT INTO nope VALUES (1, 'a', 1.0)")
    }
  }

  test("MERGE: update + delete + insert clauses, first-clause-wins, over a temp view") {
    val t = acctTable(freshCatalog())
    val tabs = Map("acct" -> t)
    ExecuteRaw.execute(spark, tabs,
      "INSERT INTO acct VALUES (1, 'a', 10.0), (2, 'b', 20.0), (3, 'c', 30.0)")
    Seq((1L, "A", -100.0), (2L, "B", 5.0), (9L, "I", 99.0))
      .toDF("id", "name", "bal").createOrReplaceTempView("merge_src")
    val n = ExecuteRaw.execute(spark, tabs,
      """MERGE INTO acct t USING merge_src s ON t.id = s.id
         WHEN MATCHED AND s.bal < 0 THEN DELETE
         WHEN MATCHED THEN UPDATE SET bal = t.bal + s.bal, name = s.name
         WHEN NOT MATCHED THEN INSERT (id, name, bal) VALUES (s.id, s.name, s.bal)""")
    // id 1 deleted (first clause claims it BEFORE the update clause),
    // id 2 updated, id 3 untouched, id 9 inserted
    assert(n == 3)
    val out = t.snapshot().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq((2L, "B", 25.0), (3L, "c", 30.0), (9L, "I", 99.0)))
  }

  test("MERGE: source can be a registered store table, read through the txn") {
    val cat = freshCatalog()
    val t = acctTable(cat)
    val delta = new GraftTable(spark, cat, "delta", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("bal", DoubleType, nullable = true))),
      uniqueKeys = Seq(Seq("id")))
    val tabs = Map("acct" -> t, "delta" -> delta)
    ExecuteRaw.executeMany(spark, tabs, Seq(
      "INSERT INTO acct VALUES (1, 'a', 10.0)",
      "INSERT INTO delta VALUES (1, 'a2', 1.0), (2, 'new', 2.0)"))
    ExecuteRaw.execute(spark, tabs,
      """MERGE INTO acct USING delta ON acct.id = delta.id
         WHEN MATCHED THEN UPDATE SET name = delta.name
         WHEN NOT MATCHED THEN INSERT (id, name, bal)
           VALUES (delta.id, delta.name, delta.bal)""")
    val out = t.snapshot().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, "a2", 10.0), (2L, "new", 2.0)))
  }

  test("MERGE: NOT MATCHED BY SOURCE, UPDATE SET *, and atomicity in a batch") {
    val t = acctTable(freshCatalog())
    val tabs = Map("acct" -> t)
    ExecuteRaw.execute(spark, tabs,
      "INSERT INTO acct VALUES (1, 'a', 10.0), (2, 'b', 20.0)")
    Seq((1L, "A*", 111.0)).toDF("id", "name", "bal")
      .createOrReplaceTempView("merge_star")
    ExecuteRaw.execute(spark, tabs,
      """MERGE INTO acct t USING merge_star s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED BY SOURCE THEN UPDATE SET bal = 0.0""")
    val out1 = t.snapshot().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out1 == Seq((1L, "A*", 111.0), (2L, "b", 0.0)))
    // a failing later statement rolls back the whole batch, MERGE included
    val failed = scala.util.Try(ExecuteRaw.executeMany(spark, tabs, Seq(
      """MERGE INTO acct t USING merge_star s ON t.id = s.id
         WHEN MATCHED THEN DELETE""",
      "INSERT INTO acct VALUES (2, 'dup', 0.0)")))
    assert(failed.isFailure, "duplicate-key batch must abort")
    assert(t.snapshot().orderBy("id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L), "MERGE delete must not leak")
  }

  test("MERGE: cardinality violation and non-equality ON are refused") {
    val t = acctTable(freshCatalog())
    val tabs = Map("acct" -> t)
    ExecuteRaw.execute(spark, tabs, "INSERT INTO acct VALUES (1, 'a', 10.0)")
    // two source rows match target id 1 → 21000-style cardinality error
    Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("id", "name", "bal")
      .createOrReplaceTempView("merge_dup")
    val e = intercept[IllegalArgumentException] {
      ExecuteRaw.execute(spark, tabs,
        """MERGE INTO acct t USING merge_dup s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET bal = s.bal""")
    }
    assert(e.getMessage.contains("cardinality"))
    intercept[IllegalArgumentException] {
      ExecuteRaw.execute(spark, tabs,
        """MERGE INTO acct t USING merge_dup s ON t.id < s.id
           WHEN MATCHED THEN UPDATE SET bal = s.bal""")
    }
  }

  test("CREATE TABLE AS SELECT creates a full-citizen store table") {
    val cat = freshCatalog()
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("k", "tag", "v").createOrReplaceTempView("ctas_src")
    val t = ExecuteRaw.executeCreate(spark, cat,
      "CREATE TABLE agg AS SELECT tag, CAST(sum(v) AS DOUBLE) AS total " +
        "FROM ctas_src GROUP BY tag",
      uniqueKeys = Seq(Seq("tag")))
    assert(t.name == "agg" && t.schema.fieldNames.toSeq == Seq("tag", "total"))
    // full citizen: raw-SQL mutations, unique-key enforcement, snapshot
    ExecuteRaw.execute(spark, Map("agg" -> t),
      "UPDATE agg SET total = 0.0 WHERE tag = 'b'")
    assert(t.snapshot().orderBy("tag").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 40.0), ("b", 0.0)))
    assert(scala.util.Try(ExecuteRaw.execute(spark, Map("agg" -> t),
      "INSERT INTO agg VALUES ('a', 1.0)")).isFailure,
      "the declared unique key must hold on the created table")
    // duplicate name, IF NOT EXISTS, and the executeIn route all refuse
    intercept[IllegalArgumentException] {
      ExecuteRaw.executeCreate(spark, cat,
        "CREATE TABLE agg AS SELECT 1 AS one")
    }
    intercept[IllegalArgumentException] {
      ExecuteRaw.executeCreate(spark, cat,
        "CREATE TABLE IF NOT EXISTS other AS SELECT 1 AS one")
    }
    val e = intercept[IllegalArgumentException] {
      ExecuteRaw.execute(spark, Map("agg" -> t),
        "CREATE TABLE other AS SELECT 1 AS one")
    }
    assert(e.getMessage.contains("executeCreate"))
  }

  test("MERGE: duplicate ON-keys among TARGET-ONLY rows are refused") {
    // ON pairs a non-unique target column: two target-only rows share
    // name 'dup', and the staged apply (keyed on the ON columns) would
    // silently collapse them into one update — the guard must refuse.
    val cat = freshCatalog()
    val t = new GraftTable(spark, cat, "acct", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("bal", DoubleType, nullable = true))),
      uniqueKeys = Seq(Seq("id")))
    val tabs = Map("acct" -> t)
    ExecuteRaw.execute(spark, tabs,
      "INSERT INTO acct VALUES (1, 'dup', 10.0), (2, 'dup', 20.0), (3, 'solo', 30.0)")
    Seq(("solo", 1.0)).toDF("name", "bal").createOrReplaceTempView("merge_tgtdup")
    val e = intercept[IllegalArgumentException] {
      ExecuteRaw.execute(spark, tabs,
        """MERGE INTO acct t USING merge_tgtdup s ON t.name = s.name
           WHEN NOT MATCHED BY SOURCE THEN UPDATE SET bal = 0.0""")
    }
    assert(e.getMessage.contains("target-only"))
    assert(t.snapshot().filter(col("bal") === 0.0).count() == 0,
      "refused MERGE must stage nothing")
  }

  test("MERGE: assigning an ON-key column in UPDATE is refused; SET * keeps the key") {
    val t = acctTable(freshCatalog())
    val tabs = Map("acct" -> t)
    ExecuteRaw.execute(spark, tabs, "INSERT INTO acct VALUES (1, 'a', 10.0)")
    Seq((1L, "A", 1.0)).toDF("id", "name", "bal")
      .createOrReplaceTempView("merge_keyset")
    val e = intercept[IllegalArgumentException] {
      ExecuteRaw.execute(spark, tabs,
        """MERGE INTO acct t USING merge_keyset s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET id = s.id + 100, bal = s.bal""")
    }
    assert(e.getMessage.contains("ON-key"))
    assert(t.snapshot().collect().map(_.getLong(0)).toSeq == Seq(1L),
      "key-changing update must not duplicate the row")
    // SET * stays allowed — the key columns are dropped from the star
    // assignment (identity under a same-named ON pair), so the matched
    // row updates IN PLACE
    ExecuteRaw.execute(spark, tabs,
      """MERGE INTO acct t USING merge_keyset s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET *""")
    val out = t.snapshot().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, "A", 1.0)))
  }

  test("MERGE: SET * under a cross-named ON pair refuses when a same-named " +
       "source key column exists, allows when it does not") {
    val t = acctTable(freshCatalog())
    val tabs = Map("acct" -> t)
    ExecuteRaw.execute(spark, tabs, "INSERT INTO acct VALUES (1, 'a', 10.0)")
    // ON t.id = s.j while the source ALSO carries a column named id:
    // SQL star semantics would assign s.id (a key rewrite) — silently
    // keeping the target key would diverge, so the star is refused as
    // loudly as the explicit form
    Seq((99L, 1L, "A", 1.0)).toDF("id", "j", "name", "bal")
      .createOrReplaceTempView("merge_crosskey")
    val e = intercept[IllegalArgumentException] {
      ExecuteRaw.execute(spark, tabs,
        """MERGE INTO acct t USING merge_crosskey s ON t.id = s.j
           WHEN MATCHED THEN UPDATE SET *""")
    }
    assert(e.getMessage.contains("ON pair"))
    assert(t.snapshot().collect().map(_.getDouble(2)).toSeq == Seq(10.0),
      "refused star merge must stage nothing")
    // no same-named source column for the key: dropping it from the star
    // is pure identity — allowed, matched row updates in place
    Seq((1L, "B", 2.0)).toDF("j", "name", "bal")
      .createOrReplaceTempView("merge_crosskey_ok")
    ExecuteRaw.execute(spark, tabs,
      """MERGE INTO acct t USING merge_crosskey_ok s ON t.id = s.j
         WHEN MATCHED THEN UPDATE SET *""")
    val out = t.snapshot().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, "B", 2.0)))
  }
}
