package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.GdxSource

/** The GDX catalog plugin (sources/GdxCatalog.scala): namespace/table
  * lifecycle over a warehouse directory, bucket-transform partitioning
  * (`PARTITIONED BY (bucket(n, col))`) with storage-partitioned joins
  * resolved through the catalog's `bucket` function, catalog SQL time
  * travel, ALTER TABLE schema evolution, and the write-side fallbacks
  * for path-based access to bucket tables. */
class GdxCatalogSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GdxSource"

  /** A private session with a fresh catalog over a fresh warehouse —
    * each test gets its own namespace-of-one-world, so suites (and
    * concurrent self-invocations) never share mutable roots. */
  private def withCatalog[T](extra: (String, String)*)(
      body: (SparkSession, String, String) => T): T = {
    val wh = java.nio.file.Files.createTempDirectory("gdxcat_").toString
    val cat = s"gdxt${java.util.UUID.randomUUID().toString.take(8)}"
    val s = Sessions.pinned(spark,
      (Seq(s"spark.sql.catalog.$cat" -> "graft.sources.GdxCatalog",
        s"spark.sql.catalog.$cat.warehouse" -> wh) ++ extra): _*)
    body(s, cat, wh)
  }

  test("namespace + table lifecycle: CREATE/SHOW/DROP through SQL") {
    withCatalog() { (s, cat, _) =>
      s.sql(s"CREATE NAMESPACE $cat.lab")
      s.sql(s"CREATE TABLE $cat.lab.t (k BIGINT, v STRING)")
      assert(s.sql(s"SHOW TABLES IN $cat.lab").collect()
        .exists(_.getString(1) == "t"))
      s.sql(s"INSERT INTO $cat.lab.t VALUES (1, 'a'), (2, 'b')")
      assert(s.sql(s"SELECT count(*) FROM $cat.lab.t")
        .collect()(0).getLong(0) == 2)
      // CREATE of an existing table refuses; IF NOT EXISTS passes
      intercept[Exception](
        s.sql(s"CREATE TABLE $cat.lab.t (k BIGINT, v STRING)"))
      s.sql(s"CREATE TABLE IF NOT EXISTS $cat.lab.t (k BIGINT, v STRING)")
      s.sql(s"DROP TABLE $cat.lab.t")
      assert(!s.sql(s"SHOW TABLES IN $cat.lab").collect()
        .exists(_.getString(1) == "t"))
      s.sql(s"DROP NAMESPACE $cat.lab")
    }
  }

  test("createTable validates the format's schema contract") {
    withCatalog() { (s, cat, _) =>
      s.sql(s"CREATE NAMESPACE $cat.lab")
      // first column must be the BIGINT key
      intercept[Exception](
        s.sql(s"CREATE TABLE $cat.lab.bad (v STRING, k BIGINT)"))
      // unsupported column types refused (TIMESTAMP/DATE/BOOLEAN/
      // DECIMAL/numeric ARRAYs/string-string MAPs are first-class —
      // GdxTypedColumnsSpec/GdxMapColumnSpec own those; non-string
      // maps and string arrays stay out)
      intercept[Exception](
        s.sql(s"CREATE TABLE $cat.lab.bad (k BIGINT, m MAP<STRING,BIGINT>)"))
      intercept[Exception](
        s.sql(s"CREATE TABLE $cat.lab.bad (k BIGINT, a ARRAY<STRING>)"))
      // partition column must exist and be BIGINT
      intercept[Exception](s.sql(
        s"CREATE TABLE $cat.lab.bad (k BIGINT, v STRING) " +
          "PARTITIONED BY (bucket(4, nope))"))
      intercept[Exception](s.sql(
        s"CREATE TABLE $cat.lab.bad (k BIGINT, v STRING) " +
          "PARTITIONED BY (v)"))
    }
  }

  test("bucket(n, col) tables demux into bucket directories the " +
      "write-side hash and the manifest agree on") {
    withCatalog() { (s, cat, wh) =>
      s.sql(s"CREATE NAMESPACE $cat.lab")
      s.sql(s"CREATE TABLE $cat.lab.b (k BIGINT, v STRING) " +
        "PARTITIONED BY (bucket(4, k))")
      Sessions.insertInto(s,
        (0L until 100L).map(i => (i, s"r$i")).toDF("k", "v"),
        s"$cat.lab.b")
      val dir = s"$wh/lab/b"
      val entries = GdxSource.committedEntries(dir, GdxSource.driverConf())
      assert(entries.nonEmpty)
      assert(entries.forall(_.name.matches("k_bucket=[0-3]/.*")))
      // every entry name proves a key in range, every row reads back,
      // and a per-bucket count recomputed with the shared hash matches
      // the manifest's per-directory row sums exactly
      val byDir = entries.groupBy(e =>
          GdxSource.partKeyOf("bucket(4,k)", e.name).get.get)
        .view.mapValues(_.flatMap(_.stats).map(_.rows).sum).toMap
      val expected = (0L until 100L).groupBy(GdxSource.bucketId(4, _))
        .map { case (b, ks) => b.toLong -> ks.size.toLong }
      assert(byDir == expected)
      assert(s.sql(s"SELECT count(*) FROM $cat.lab.b")
        .collect()(0).getLong(0) == 100)
    }
  }

  test("equality and IN predicates on the bucket column prune to the " +
      "matching bucket directories only") {
    withCatalog() { (s, cat, wh) =>
      s.sql(s"CREATE NAMESPACE $cat.lab")
      s.sql(s"CREATE TABLE $cat.lab.b (k BIGINT, v STRING) " +
        "PARTITIONED BY (bucket(8, k))")
      Sessions.insertInto(s,
        (0L until 400L).map(i => (i, s"r$i")).toDF("k", "v"),
        s"$cat.lab.b")
      val q = s.sql(s"SELECT v FROM $cat.lab.b WHERE k = 123")
      assert(q.collect().map(_.getString(0)).toSeq == Seq("r123"))
      val scanLine = q.queryExecution.executedPlan.toString()
        .linesIterator.find(_.contains("GdxScan")).get
      // 8 bucket dirs, one file each (clustered write): k=123 plans
      // exactly the one file in bucket bucketId(8,123) — the plan line
      // prints files=<kept>/<total>
      assert(scanLine.contains("files=1/8"), scanLine)
      val in = s.sql(s"SELECT count(*) FROM $cat.lab.b " +
        "WHERE k IN (5, 123, 397)")
      assert(in.collect()(0).getLong(0) == 3)
    }
  }

  test("bucket-layout SPJ: a catalog join on the raw key runs with " +
      "ZERO shuffle exchanges and matches the classic plan") {
    withCatalog(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") { (s, cat, _) =>
      s.sql(s"CREATE NAMESPACE $cat.lab")
      s.sql(s"CREATE TABLE $cat.lab.fact (k BIGINT, v STRING) " +
        "PARTITIONED BY (bucket(8, k))")
      s.sql(s"CREATE TABLE $cat.lab.delta (k BIGINT, bv STRING) " +
        "PARTITIONED BY (bucket(8, k))")
      Sessions.insertInto(s,
        (0L until 1000L).map(i => (i, s"r$i")).toDF("k", "v"),
        s"$cat.lab.fact")
      Sessions.insertInto(s,
        (0L until 100L).map(i => (i * 10, s"d$i")).toDF("k", "bv"),
        s"$cat.lab.delta")
      // join on k ALONE (the partition transform's source column) and
      // aggregate grouped on k: bucket co-partitioning satisfies both
      val q = s.sql(s"SELECT f.k, count(*) AS n FROM $cat.lab.fact f " +
        s"JOIN $cat.lab.delta d ON f.k = d.k GROUP BY f.k")
      val plan = q.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"), plan)
      val rows = q.collect()
      assert(rows.length == 100 && rows.forall(_.getLong(1) == 1))
      // classic plan (switch off) agrees
      val off = Sessions.pinned(s,
        "spark.sql.sources.v2.bucketing.enabled" -> "false")
      val classic = off.sql(s"SELECT f.k, count(*) AS n " +
        s"FROM $cat.lab.fact f JOIN $cat.lab.delta d ON f.k = d.k " +
        "GROUP BY f.k")
      assert(classic.queryExecution.executedPlan.toString()
        .contains("Exchange"))
      assert(classic.collect().map(r => (r.getLong(0), r.getLong(1)))
        .sorted.toSeq ==
        rows.map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    }
  }

  test("catalog SQL time travel: FOR VERSION AS OF pins a snapshot, " +
      "refuses writes, and never matches the live table's schema era") {
    withCatalog() { (s, cat, _) =>
      s.sql(s"CREATE NAMESPACE $cat.lab")
      s.sql(s"CREATE TABLE $cat.lab.t (k BIGINT, v STRING)")
      s.sql(s"INSERT INTO $cat.lab.t VALUES (1, 'a')")        // v2
      s.sql(s"INSERT INTO $cat.lab.t VALUES (2, 'b'), (3, 'c')") // v3
      assert(s.sql(s"SELECT count(*) FROM $cat.lab.t FOR VERSION AS OF 2")
        .collect()(0).getLong(0) == 1)
      assert(s.sql(s"SELECT count(*) FROM $cat.lab.t")
        .collect()(0).getLong(0) == 3)
      // a time-travel relation refuses INSERT
      intercept[Exception](s.sql(
        s"INSERT INTO $cat.lab.t FOR VERSION AS OF 2 VALUES (9, 'z')"))
      // TIMESTAMP AS OF after the last commit resolves to the live
      // snapshot (micros → versionAsOf)
      val far = java.time.Instant.now().plusSeconds(3600).toString
      assert(s.sql(s"SELECT count(*) FROM $cat.lab.t " +
        s"FOR TIMESTAMP AS OF '$far'").collect()(0).getLong(0) == 3)
    }
  }

  test("ALTER TABLE through the catalog: ADD/RENAME/DROP COLUMN ride " +
      "the metadata-only evolution; the partition column is guarded") {
    withCatalog() { (s, cat, _) =>
      s.sql(s"CREATE NAMESPACE $cat.lab")
      s.sql(s"CREATE TABLE $cat.lab.t (k BIGINT, v STRING, w BIGINT) " +
        "PARTITIONED BY (w)")
      s.sql(s"INSERT INTO $cat.lab.t VALUES (1, 'a', 0)")
      s.sql(s"ALTER TABLE $cat.lab.t ADD COLUMNS (x DOUBLE)")
      s.sql(s"INSERT INTO $cat.lab.t VALUES (2, 'b', 1, 2.5)")
      assert(s.sql(s"SELECT sum(x) FROM $cat.lab.t")
        .collect()(0).getDouble(0) == 2.5)
      s.sql(s"ALTER TABLE $cat.lab.t RENAME COLUMN x TO y")
      assert(s.sql(s"SELECT count(y) FROM $cat.lab.t")
        .collect()(0).getLong(0) == 1)
      s.sql(s"ALTER TABLE $cat.lab.t DROP COLUMN y")
      assert(!s.table(s"$cat.lab.t").columns.contains("y"))
      // the partition column cannot be renamed or dropped — the
      // `#partition` header references it by name
      intercept[Exception](
        s.sql(s"ALTER TABLE $cat.lab.t RENAME COLUMN w TO z"))
      intercept[Exception](
        s.sql(s"ALTER TABLE $cat.lab.t DROP COLUMN w"))
    }
  }

  test("path-based writes to a bucket table keep the layout (fallback " +
      "identity clustering) and path reads see catalog writes") {
    withCatalog() { (s, cat, wh) =>
      s.sql(s"CREATE NAMESPACE $cat.lab")
      s.sql(s"CREATE TABLE $cat.lab.b (k BIGINT, v STRING) " +
        "PARTITIONED BY (bucket(4, k))")
      val dir = s"$wh/lab/b"
      // path-based append (no catalog, no bucket function available)
      (100L until 200L).map(i => (i, s"p$i")).toDF("k", "v")
        .write.format(fmt).option("path", dir).mode("append").save()
      val entries = GdxSource.committedEntries(dir, GdxSource.driverConf())
      assert(entries.forall(_.name.matches("k_bucket=[0-3]/.*")))
      assert(s.sql(s"SELECT count(*) FROM $cat.lab.b")
        .collect()(0).getLong(0) == 100)
      // a contradictory explicit layout is refused
      intercept[Exception] {
        (0L until 10L).map(i => (i, "x")).toDF("k", "v")
          .write.format(fmt).option("path", dir)
          .option("partitionBy", "k").mode("append").save()
      }
    }
  }

  test("NULL values in the bucket column land in the __null__ " +
      "directory and read back; SPJ keys stay type-correct") {
    withCatalog(
      "spark.sql.sources.v2.bucketing.enabled" -> "true") { (s, cat, wh) =>
      s.sql(s"CREATE NAMESPACE $cat.lab")
      s.sql(s"CREATE TABLE $cat.lab.b (k BIGINT, v STRING, w BIGINT) " +
        "PARTITIONED BY (bucket(4, w))")
      s.sql(s"INSERT INTO $cat.lab.b VALUES (1, 'a', 7), (2, 'b', NULL)")
      val dir = s"$wh/lab/b"
      val entries = GdxSource.committedEntries(dir, GdxSource.driverConf())
      assert(entries.exists(_.name.startsWith("w_bucket=__null__/")))
      val rows = s.sql(s"SELECT k, w FROM $cat.lab.b ORDER BY k").collect()
      assert(rows.length == 2 && rows(1).isNullAt(1))
    }
  }

  test("renameTable moves the directory; the old name is gone") {
    withCatalog() { (s, cat, _) =>
      s.sql(s"CREATE NAMESPACE $cat.lab")
      s.sql(s"CREATE TABLE $cat.lab.t (k BIGINT, v STRING)")
      s.sql(s"INSERT INTO $cat.lab.t VALUES (1, 'a')")
      s.sql(s"ALTER TABLE $cat.lab.t RENAME TO lab.t2")
      assert(s.sql(s"SELECT count(*) FROM $cat.lab.t2")
        .collect()(0).getLong(0) == 1)
      intercept[Exception](s.sql(s"SELECT * FROM $cat.lab.t").collect())
    }
  }

  test("one-side-shuffle SPJ: an unpartitioned frame joins a bucket " +
      "table by hashing through the catalog bucket function (only the " +
      "small side shuffles)") {
    withCatalog(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") { (s, cat, _) =>
      s.sql(s"CREATE NAMESPACE $cat.lab")
      s.sql(s"CREATE TABLE $cat.lab.fact (k BIGINT, v STRING) " +
        "PARTITIONED BY (bucket(8, k))")
      Sessions.insertInto(s,
        (0L until 1000L).map(i => (i, s"r$i")).toDF("k", "v"),
        s"$cat.lab.fact")
      val probe = Sessions.rebind(
        (0L until 50L).map(i => (i * 20, i)).toDF("k", "m"), s)
      val q = s.table(s"$cat.lab.fact").join(probe, Seq("k"))
        .agg(count(lit(1)).as("n"), sum("m").as("sm"))
      val r = q.collect()(0)
      assert(r.getLong(0) == 50 && r.getLong(1) == (0L until 50L).sum)
      // the FACT side must not shuffle: the probe side plans ONE
      // keygroupedpartitioning exchange (hashed through the catalog's
      // bucket function into the stored layout), the join itself none.
      // Count the FINAL AQE plan only — toString repeats the initial.
      val plan = q.queryExecution.executedPlan.toString()
        .split("== Initial Plan ==")(0)
      assert("Exchange keygroupedpartitioning".r
        .findAllIn(plan).length == 1, plan)
      assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty, plan)
    }
  }

  test("metadata tables: gdx.ns.t.files / .history / .partitions " +
      "answer from manifests alone") {
    withCatalog() { (s, cat, wh) =>
      s.sql(s"CREATE NAMESPACE $cat.lab")
      s.sql(s"CREATE TABLE $cat.lab.t (k BIGINT, v STRING, p BIGINT) " +
        "PARTITIONED BY (p)")
      s.sql(s"INSERT INTO $cat.lab.t VALUES (1,'a',0), (2,'b',1)")
      s.sql(s"INSERT INTO $cat.lab.t VALUES (3,'c',0)")
      // files: one per (commit, partition value) = 2 + 1
      val files = s.sql(s"SELECT file, rows, min_k, max_k, part_key " +
        s"FROM $cat.lab.t.files ORDER BY file").collect()
      assert(files.length == 3)
      assert(files.map(_.getLong(1)).sum == 3)
      assert(files.forall(r => r.getString(0).startsWith("p=")))
      assert(files.map(_.getLong(4)).sorted.toSeq == Seq(0L, 0L, 1L))
      // history: create (empty) + two inserts
      val hist = s.sql(s"SELECT version, n_files, n_rows " +
        s"FROM $cat.lab.t.history ORDER BY version").collect()
      assert(hist.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq == Seq((1L, 0L, 0L), (2L, 2L, 2L), (3L, 3L, 3L)))
      // partitions: per-directory profile
      val parts = s.sql(s"SELECT part_key, n_files, n_rows, min_k, max_k " +
        s"FROM $cat.lab.t.partitions ORDER BY part_key").collect()
      assert(parts.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq ==
        Seq((0L, 2L, 2L, 1L, 3L), (1L, 1L, 1L, 2L, 2L)))
      // tags and branches registries as metadata tables
      graft.sources.GdxSource.createTag(s"$wh/lab/t", "snap1")
      graft.sources.GdxSource.createBranch(s"$wh/lab/t", "wip")
      assert(s.sql(s"SELECT tag, version FROM $cat.lab.t.tags")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        == Seq(("snap1", 3L)))
      assert(s.sql(
        s"SELECT branch, base_version FROM $cat.lab.t.branches")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        == Seq(("wip", 3L)))
      graft.sources.GdxSource.dropBranch(s"$wh/lab/t", "wip")
      assert(s.sql(s"SELECT * FROM $cat.lab.t.branches")
        .collect().isEmpty)
      // a real table shadows the metadata suffix
      s.sql(s"CREATE NAMESPACE $cat.lab.t2")
      s.sql(s"CREATE TABLE $cat.lab.t2.files (k BIGINT, v STRING)")
      s.sql(s"INSERT INTO $cat.lab.t2.files VALUES (9, 'x')")
      assert(s.sql(s"SELECT v FROM $cat.lab.t2.files")
        .head.getString(0) == "x")
    }
  }

  test("DML and maintenance SQL route to catalog tables: DELETE / " +
      "UPDATE / MERGE / OPTIMIZE / DESCRIBE HISTORY on gdx.ns.t") {
    // analyzer/parser extension points bind at session construction —
    // build a sibling with GraftExtensions, then point a catalog at a
    // fresh warehouse on it
    val s0 = org.apache.spark.sql.graft.ColumnBridge
      .sessionWithExtensions(spark, new GraftExtensions())
    val wh = java.nio.file.Files.createTempDirectory("gdxcat_dml_")
      .toString
    val cat = s"gdxd${java.util.UUID.randomUUID().toString.take(8)}"
    s0.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GdxCatalog")
    s0.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    s0.sql(s"CREATE NAMESPACE $cat.lab")
    s0.sql(s"CREATE TABLE $cat.lab.t (k BIGINT, v STRING)")
    s0.sql(s"INSERT INTO $cat.lab.t VALUES (1,'a'),(2,'b'),(3,'c')")
    s0.sql(s"DELETE FROM $cat.lab.t WHERE k = 2")
    assert(s0.sql(s"SELECT count(*) FROM $cat.lab.t")
      .head.getLong(0) == 2)
    s0.sql(s"UPDATE $cat.lab.t SET v = concat(v, '!') WHERE k = 3")
    assert(s0.sql(s"SELECT v FROM $cat.lab.t WHERE k = 3")
      .head.getString(0) == "c!")
    s0.sql(s"MERGE INTO $cat.lab.t t USING (SELECT 1 AS k, 'A' AS v) u" +
      " ON t.k = u.k" +
      " WHEN MATCHED THEN UPDATE SET v = u.v" +
      " WHEN NOT MATCHED THEN INSERT (k, v) VALUES (u.k, u.v)")
    assert(s0.sql(s"SELECT v FROM $cat.lab.t WHERE k = 1")
      .head.getString(0) == "A")
    val hist = s0.sql(s"DESCRIBE HISTORY $cat.lab.t").collect()
    assert(hist.length >= 5) // create + insert + delete + update + merge
    s0.sql(s"OPTIMIZE $cat.lab.t")
    assert(s0.sql(s"SELECT count(*) FROM $cat.lab.t")
      .head.getLong(0) == 2)
    // RESTORE TABLE re-publishes the old snapshot as a NEW commit:
    // back to the 3-row v2, with history intact (a later restore can
    // undo the restore)
    val restored = s0.sql(
      s"RESTORE TABLE $cat.lab.t TO VERSION AS OF 2").collect()
    assert(restored.head.getLong(0) == 2L)
    assert(s0.sql(s"SELECT count(*) FROM $cat.lab.t")
      .head.getLong(0) == 3)
    assert(s0.sql(s"SELECT v FROM $cat.lab.t WHERE k = 2")
      .head.getString(0) == "b")
  }

  test("CTAS through the catalog creates and fills the table, " +
      "inferring the layout from PARTITIONED BY") {
    withCatalog() { (s, cat, wh) =>
      s.sql(s"CREATE NAMESPACE $cat.lab")
      s.sql(s"CREATE TABLE $cat.lab.src (k BIGINT, v STRING)")
      s.sql(s"INSERT INTO $cat.lab.src VALUES (1,'a'),(2,'b'),(3,'c')")
      s.sql(s"CREATE TABLE $cat.lab.ctas PARTITIONED BY (bucket(2, k)) " +
        s"AS SELECT k, v FROM $cat.lab.src WHERE k > 1")
      assert(s.sql(s"SELECT count(*) FROM $cat.lab.ctas")
        .head.getLong(0) == 2)
      val entries = GdxSource.committedEntries(s"$wh/lab/ctas",
        GdxSource.driverConf())
      assert(entries.forall(_.name.matches("k_bucket=[01]/.*")))
    }
  }

  test("atomic RTAS: CREATE OR REPLACE TABLE AS SELECT swaps content " +
      "in one commit; history time-travels; staged aborts leave nothing") {
    withCatalog() { (s, cat, wh) =>
      s.sql(s"CREATE NAMESPACE $cat.lab")
      s.sql(s"CREATE TABLE $cat.lab.t (k BIGINT, v STRING)")
      s.sql(s"INSERT INTO $cat.lab.t VALUES (1,'a'),(2,'b')")
      val vBefore = GdxSource.listVersions(s"$wh/lab/t",
        GdxSource.driverConf()).max
      s.sql(s"CREATE OR REPLACE TABLE $cat.lab.t AS " +
        "SELECT CAST(9 AS BIGINT) AS k, 'r' AS v")
      assert(s.sql(s"SELECT k, v FROM $cat.lab.t").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((9L, "r")))
      // the replace is a versioned commit: the old content time-travels
      assert(s.sql(s"SELECT count(*) FROM $cat.lab.t " +
        s"FOR VERSION AS OF $vBefore").head.getLong(0) === 2L)
      // REPLACE of a missing table errors; CREATE OR REPLACE creates
      intercept[Exception] {
        s.sql(s"REPLACE TABLE $cat.lab.nope AS SELECT CAST(1 AS BIGINT) k")
      }
      s.sql(s"CREATE OR REPLACE TABLE $cat.lab.fresh AS " +
        "SELECT CAST(5 AS BIGINT) AS k, 'x' AS v")
      assert(s.sql(s"SELECT k FROM $cat.lab.fresh").head.getLong(0) === 5L)
      // staged-create abort: no manifest ever published, directory gone,
      // the identifier never resolves
      val gcat = s.sessionState.catalogManager.catalog(cat)
        .asInstanceOf[graft.sources.GdxCatalog]
      val ident = org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("lab"), "ghost")
      def info = new org.apache.spark.sql.connector.catalog.TableInfo
        .Builder()
        .withColumns(Array(org.apache.spark.sql.connector.catalog
          .Column.create("k", org.apache.spark.sql.types.LongType)))
        .withPartitions(Array.empty).withProperties(
          java.util.Collections.emptyMap()).build()
      val staged = gcat.stageCreate(ident, info)
      intercept[Exception] { s.sql(s"SELECT * FROM $cat.lab.ghost") }
      staged.abortStagedChanges()
      assert(!new java.io.File(s"$wh/lab/ghost").exists())
      // two concurrent staged CREATEs: the loser conflicts loudly (CAS
      // on v1), never a silent last-wins re-declaration
      val race = org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("lab"), "race")
      val sA = gcat.stageCreate(race, info)
      val sB = gcat.stageCreate(race, info)
      sA.commitStagedChanges()
      intercept[graft.sources.GdxConcurrentModificationException] {
        sB.commitStagedChanges()
      }
    }
  }

  test("a streaming writeStream.toTable sinks into a catalog bucket " +
      "table exactly-once with the layout intact") {
    withCatalog() { (s, cat, wh) =>
      s.sql(s"CREATE NAMESPACE $cat.lab")
      s.sql(s"CREATE TABLE $cat.lab.st (k BIGINT, v STRING) " +
        "PARTITIONED BY (bucket(4, k))")
      val src = java.nio.file.Files
        .createTempDirectory("gdxcat_stream_").toString + "/in"
      import spark.implicits._
      (0L until 40L).map(i => (i, s"s$i")).toDF("k", "v")
        .write.json(src)
      val ckpt = java.nio.file.Files
        .createTempDirectory("gdxcat_ckpt_").toString
      val q = s.readStream
        .schema("k BIGINT, v STRING").json(src)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(s"$cat.lab.st")
      q.awaitTermination(60000)
      assert(s.sql(s"SELECT count(*) FROM $cat.lab.st")
        .head.getLong(0) == 40)
      val entries = GdxSource.committedEntries(s"$wh/lab/st",
        GdxSource.driverConf())
      assert(entries.nonEmpty &&
        entries.forall(_.name.matches("k_bucket=[0-3]/.*")))
    }
  }
}
