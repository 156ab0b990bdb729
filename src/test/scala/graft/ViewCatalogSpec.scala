package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** SQL views on the commit-log catalog (`CommitLogCatalog with
  * ViewCatalog`): the reference's gold layer IS a view
  * (`CREATE OR REPLACE VIEW stock_pipeline.gold.price_features AS …`,
  * docs/databricks_setup.md:209) — this pins the same DDL surface on
  * the standalone catalog: create / replace / query / SHOW VIEWS /
  * ALTER VIEW properties / rename / drop, all metastore-free (one JSON
  * file per view in the warehouse tree).
  */
class ViewCatalogSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val cat = s"graft_view$n"
    val wh = Files.createTempDirectory("graft-view-spec").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.CommitLogCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  test("CREATE OR REPLACE VIEW over a commit-log table; query + replace see the live table") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.gold.prices (sym STRING, px DOUBLE) USING commitlog")
    spark.sql(s"INSERT INTO $cat.gold.prices VALUES ('A', 1.0), ('B', 2.0), ('A', 3.0)")
    spark.sql(
      s"""CREATE OR REPLACE VIEW $cat.gold.price_features AS
         |SELECT sym, avg(px) AS avg_px FROM $cat.gold.prices GROUP BY sym""".stripMargin)
    assert(Files.isRegularFile(
      java.nio.file.Paths.get(wh, "gold", "price_features.view.json")))
    assert(spark.sql(s"SELECT * FROM $cat.gold.price_features ORDER BY sym")
      .as[(String, Double)].collect().toSeq == Seq(("A", 2.0), ("B", 2.0)))
    // a view is a definition, not a snapshot: new table rows show up
    spark.sql(s"INSERT INTO $cat.gold.prices VALUES ('B', 6.0)")
    assert(spark.sql(
      s"SELECT avg_px FROM $cat.gold.price_features WHERE sym = 'B'")
      .head.getDouble(0) == 4.0)
    // REPLACE swaps the definition atomically
    spark.sql(
      s"""CREATE OR REPLACE VIEW $cat.gold.price_features AS
         |SELECT sym, count(*) AS n_px FROM $cat.gold.prices GROUP BY sym""".stripMargin)
    assert(spark.sql(
      s"SELECT n_px FROM $cat.gold.price_features WHERE sym = 'A'")
      .head.getLong(0) == 2)
  }

  test("view body's unqualified names resolve in the DEFINING session context, not the reader's") {
    val (cat, _) = freshCatalog()
    val loc = Files.createTempDirectory("graft-view-ctx")
    spark.sql("CREATE DATABASE IF NOT EXISTS vdb1")
    spark.sql("CREATE DATABASE IF NOT EXISTS vdb2")
    // explicit unique locations: the in-memory catalog forgets tables
    // across suite runs but managed locations persist on disk
    spark.sql("DROP TABLE IF EXISTS vdb1.vt")
    spark.sql("DROP TABLE IF EXISTS vdb2.vt")
    spark.sql(s"CREATE TABLE vdb1.vt (k BIGINT) USING parquet LOCATION '$loc/t1'")
    spark.sql(s"CREATE TABLE vdb2.vt (k BIGINT) USING parquet LOCATION '$loc/t2'")
    spark.sql("INSERT INTO vdb1.vt VALUES (7)")
    spark.sql("INSERT INTO vdb2.vt VALUES (99)")
    try {
      spark.sql("USE vdb1")
      spark.sql(s"CREATE VIEW $cat.g.v AS SELECT k FROM vt")
      spark.sql("USE vdb2") // same unqualified name now means another table
      assert(spark.sql(s"SELECT k FROM $cat.g.v")
        .as[Long].collect().toSeq == Seq(7L),
        "the view must keep binding to the table its definer saw")
    } finally spark.sql("USE default")
  }

  test("ALTER VIEW RENAME across catalogs is refused, not silently nested") {
    val (cat, _) = freshCatalog()
    val (cat2, _) = freshCatalog()
    spark.sql(s"CREATE VIEW $cat.ns.v AS SELECT 1 AS x")
    val ex = intercept[Exception](spark.sql(
      s"ALTER VIEW $cat.ns.v RENAME TO $cat2.ns.v"))
    assert(ex.getMessage.contains("across catalogs"), ex.getMessage)
    // still readable under the original name — nothing moved
    assert(spark.sql(s"SELECT x FROM $cat.ns.v").head.getInt(0) == 1)
    // a TYPO'D catalog head (registered nowhere) must refuse too, not be
    // silently treated as a nested namespace inside this catalog
    val ex2 = intercept[Exception](spark.sql(
      s"ALTER VIEW $cat.ns.v RENAME TO ${cat}_typo.ns.v"))
    assert(ex2.getMessage.contains("not a registered catalog"), ex2.getMessage)
    assert(spark.sql(s"SELECT x FROM $cat.ns.v").head.getInt(0) == 1)
    // the supported namespace-move spelling still works: <catalog>.ns2.v
    spark.sql(s"ALTER VIEW $cat.ns.v RENAME TO $cat.ns2.v")
    assert(spark.sql(s"SELECT x FROM $cat.ns2.v").head.getInt(0) == 1)
  }

  test("SHOW VIEWS, ALTER VIEW properties, RENAME, DROP") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.default.t (k BIGINT) USING commitlog")
    spark.sql(s"INSERT INTO $cat.default.t VALUES (1), (2)")
    spark.sql(s"CREATE VIEW $cat.default.v1 AS SELECT k FROM $cat.default.t WHERE k > 1")
    spark.sql(s"CREATE VIEW $cat.default.v2 AS SELECT count(*) AS n FROM $cat.default.t")
    assert(spark.sql(s"SHOW VIEWS IN $cat.default").collect()
      .map(_.getString(1)).toSet == Set("v1", "v2"))
    // duplicate create refused; OR REPLACE and IF NOT EXISTS both fine
    intercept[Exception](spark.sql(
      s"CREATE VIEW $cat.default.v1 AS SELECT 1 AS x"))
    spark.sql(s"CREATE VIEW IF NOT EXISTS $cat.default.v1 AS SELECT 1 AS x")
    assert(spark.sql(s"SELECT * FROM $cat.default.v1").head.getLong(0) == 2,
      "IF NOT EXISTS must keep the original definition")
    spark.sql(
      s"ALTER VIEW $cat.default.v1 SET TBLPROPERTIES ('layer' = 'gold')")
    val vcat = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[graft.sources.CommitLogCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("default"), "v1")
    assert(vcat.loadView(ident).properties().get("layer") == "gold")
    spark.sql(s"ALTER VIEW $cat.default.v1 UNSET TBLPROPERTIES ('layer')")
    assert(!vcat.loadView(ident).properties().containsKey("layer"))
    spark.sql(s"ALTER VIEW $cat.default.v1 RENAME TO $cat.default.v1r")
    assert(spark.sql(s"SELECT * FROM $cat.default.v1r").head.getLong(0) == 2)
    spark.sql(s"DROP VIEW $cat.default.v1r")
    spark.sql(s"DROP VIEW $cat.default.v2")
    assert(spark.sql(s"SHOW VIEWS IN $cat.default").count() == 0)
  }
}
