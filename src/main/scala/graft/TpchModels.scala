package graft

import graft.query._
import org.apache.spark.sql.SparkSession

/** [[graft.query.Model]] instances over the driver test corpus, so the
  * Prisma-equivalent surface is exercised (and oracle-checked) on real
  * parquet tables, not only on in-memory fixtures.
  *
  * Relation shapes mirror the reference's (SURVEY §2.D): 1-N like
  * Company→CrmSyncEvent, and M-N through a join table like
  * Company↔FirmService — here part↔supplier through lineitem
  * (l_partkey, l_suppkey) plays the join-table role.
  */
object TpchModels {

  def customer(s: SparkSession, dir: String): Model = new Model(
    df = () => Tables.customer(s, dir),
    primaryKey = "c_custkey",
    relations = Seq(
      OneToMany("orders", () => Tables.orders(s, dir),
        localKey = "c_custkey", foreignKey = "o_custkey")))

  def orders(s: SparkSession, dir: String): Model = new Model(
    df = () => Tables.orders(s, dir),
    primaryKey = "o_orderkey",
    relations = Seq(
      OneToMany("lineitems", () => Tables.lineitem(s, dir),
        localKey = "o_orderkey", foreignKey = "l_orderkey")))

  def part(s: SparkSession, dir: String): Model = new Model(
    df = () => Tables.part(s, dir),
    primaryKey = "p_partkey",
    relations = Seq(
      ManyToMany("suppliers", () => Tables.supplier(s, dir),
        () => Tables.lineitem(s, dir).select(
          org.apache.spark.sql.functions.col("l_partkey"),
          org.apache.spark.sql.functions.col("l_suppkey")),
        localKey = "p_partkey", jtLocal = "l_partkey",
        jtForeign = "l_suppkey", foreignKey = "s_suppkey")))

  def supplier(s: SparkSession, dir: String): Model = new Model(
    df = () => Tables.supplier(s, dir),
    primaryKey = "s_suppkey",
    relations = Seq(
      OneToMany("lineitems", () => Tables.lineitem(s, dir),
        localKey = "s_suppkey", foreignKey = "l_suppkey")))
}
