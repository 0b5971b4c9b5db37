package graft

import org.apache.spark.sql.functions._
import graft.sources.GdxSource

/** Multi-table transactions (sources/GdxSource.prepareTransaction /
  * transact): each participating table's next version is claimed by a
  * redirect manifest pointing at ONE decision file, whose single
  * create-exclusive PUT commits or aborts every claim atomically.
  * Undecided claims are invisible to readers and loud on explicit
  * pins; a blocked writer aborts a stale claim (first decision wins);
  * vacuum reaps an aborted transaction's staged files. */
class GdxTxnSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GdxSource"
  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxtxn_$tag").toString + "/t"
  private def conf = GdxSource.driverConf()
  private def read(dir: String) =
    spark.read.format(fmt).option("path", dir).load()
  private def seed(dir: String, n: Int): Unit =
    (0L until n.toLong).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode("overwrite").save()

  test("commit flips BOTH tables at once; before the decision neither " +
      "shows anything and the claims are loud on explicit pins") {
    val a = freshDir("a"); val b = freshDir("b")
    seed(a, 10); seed(b, 20)
    val txn = GdxSource.prepareTransaction(spark, Seq(
      GdxSource.GdxTxnWrite(a,
        Seq((100L, "txa")).toDF("k", "v")),
      GdxSource.GdxTxnWrite(b,
        Seq((200L, "txb")).toDF("k", "v"))))
    // claims exist but are INVISIBLE: both tables still read their base
    assert(GdxSource.listVersions(a, conf) === Seq(1, 2))
    assert(read(a).count() === 10L && read(b).count() === 20L)
    // an explicit pin on the undecided claim is loud
    val e = intercept[Exception] {
      spark.read.format(fmt).option("path", a).option("version", "2")
        .load().count()
    }
    assert(e.getMessage.contains("UNDECIDED"), e.getMessage)
    // ONE decision PUT commits both
    val committed = txn.commit()
    assert(committed.map(_._2) === Seq(2, 2))
    assert(read(a).count() === 11L && read(b).count() === 21L)
    assert(read(a).filter(col("v") === "txa").count() === 1L)
    assert(read(b).filter(col("v") === "txb").count() === 1L)
    // the pre-txn snapshots still time-travel; the committed claim
    // pins exactly
    assert(spark.read.format(fmt).option("path", a)
      .option("version", "1").load().count() === 10L)
    assert(spark.read.format(fmt).option("path", a)
      .option("version", "2").load().count() === 11L)
    // commit is idempotent; a late abort loses
    assert(txn.commit().map(_._2) === Seq(2, 2))
    assert(!txn.abort())
  }

  test("abort hides the writes forever; later appends chain past the " +
      "aborted claim and vacuum reaps its staged files") {
    val a = freshDir("aa"); val b = freshDir("ab")
    seed(a, 5); seed(b, 5)
    val txn = GdxSource.prepareTransaction(spark, Seq(
      GdxSource.GdxTxnWrite(a, Seq((50L, "x")).toDF("k", "v")),
      GdxSource.GdxTxnWrite(b, Seq((60L, "y")).toDF("k", "v"))))
    assert(txn.abort())
    assert(read(a).count() === 5L && read(b).count() === 5L)
    // a normal append chains past the aborted v2 (reads as empty delta)
    Seq((70L, "later")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", a).mode("append").save()
    assert(GdxSource.listVersions(a, conf) === Seq(1, 2, 3))
    assert(read(a).count() === 6L)
    // the aborted version explicitly pinned = its predecessor snapshot
    assert(spark.read.format(fmt).option("path", a)
      .option("version", "2").load().count() === 5L)
    // vacuum reaps the aborted stage's unreferenced data files
    val strays = new java.io.File(a).listFiles()
      .filter(_.getName.startsWith("upd-"))
    assert(strays.nonEmpty, "prepare must have staged data files")
    GdxSource.vacuum(a, conf, keepLast = 3)
    assert(new java.io.File(a).listFiles()
      .forall(f => !f.getName.startsWith("upd-")))
    assert(read(a).count() === 6L)
  }

  test("a blocked writer STEALS the decision: the transaction aborts, " +
      "its commit throws, and the writer's own commit lands") {
    val a = freshDir("sa"); val b = freshDir("sb")
    seed(a, 5); seed(b, 5)
    val txn = GdxSource.prepareTransaction(spark, Seq(
      GdxSource.GdxTxnWrite(a, Seq((50L, "tx")).toDF("k", "v")),
      GdxSource.GdxTxnWrite(b, Seq((60L, "tx")).toDF("k", "v"))))
    // a concurrent writer needs a's next slot: it aborts the stale
    // claim and chains past it
    Seq((70L, "winner")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", a).mode("append").save()
    assert(read(a).filter(col("v") === "winner").count() === 1L)
    intercept[graft.sources.GdxConcurrentModificationException] {
      txn.commit()
    }
    // ATOMIC abort: table b (never touched by the writer) must not
    // show the transaction's row either
    assert(read(a).filter(col("v") === "tx").count() === 0L)
    assert(read(b).count() === 5L)
  }

  test("constraints are enforced at stage time; schema mismatches and " +
      "duplicate tables refuse") {
    val a = freshDir("ca")
    seed(a, 5)
    GdxSource.addConstraint(spark, a, "pos", "k >= 0")
    val e1 = intercept[graft.sources.GdxConstraintViolationException] {
      GdxSource.prepareTransaction(spark, Seq(
        GdxSource.GdxTxnWrite(a, Seq((-1L, "bad")).toDF("k", "v"))))
    }
    assert(e1.getMessage.contains("pos"))
    assert(GdxSource.listVersions(a, conf).max === 2) // constraint commit
    val e2 = intercept[Exception] {
      GdxSource.prepareTransaction(spark, Seq(
        GdxSource.GdxTxnWrite(a, Seq(1L).toDF("k"))))
    }
    assert(e2.getMessage.contains("schema"), e2.getMessage)
    intercept[Exception] {
      GdxSource.prepareTransaction(spark, Seq(
        GdxSource.GdxTxnWrite(a, Seq((1L, "x")).toDF("k", "v")),
        GdxSource.GdxTxnWrite(a, Seq((2L, "y")).toDF("k", "v"))))
    }
  }

  test("a staging failure on a LATER table aborts the earlier tables' " +
      "claims: nothing is wedged, maintenance keeps working") {
    val a = freshDir("pa"); val b = freshDir("pb")
    seed(a, 5); seed(b, 5)
    GdxSource.addConstraint(spark, b, "pos", "k >= 0") // b at v2
    intercept[graft.sources.GdxConstraintViolationException] {
      GdxSource.prepareTransaction(spark, Seq(
        GdxSource.GdxTxnWrite(a, Seq((50L, "ok")).toDF("k", "v")),
        GdxSource.GdxTxnWrite(b, Seq((-1L, "bad")).toDF("k", "v"))))
    }
    // a's claim was published before b's staging failed — the abort
    // decided it, so reads, maintenance, and later writes all work
    assert(read(a).count() === 5L)
    GdxSource.vacuum(a, conf, keepLast = 3)
    Seq((60L, "later")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", a).mode("append").save()
    assert(read(a).count() === 6L)
  }

  test("commit materializes every claim: no manifest keeps a #txn " +
      "redirect, so destroying the coordinator's decision file can " +
      "never un-commit another table") {
    val a = freshDir("ma"); val b = freshDir("mb")
    seed(a, 5); seed(b, 5)
    GdxSource.transact(spark, Seq(
      GdxSource.GdxTxnWrite(a, Seq((50L, "x")).toDF("k", "v")),
      GdxSource.GdxTxnWrite(b, Seq((60L, "y")).toDF("k", "v"))))
    def redirects(dir: String): Seq[String] =
      new java.io.File(dir).listFiles().toSeq
        .filter(_.getName.matches("_manifest-\\d+"))
        .filter(f => java.nio.file.Files.readAllLines(f.toPath)
          .toArray.exists(_.toString.startsWith("#txn")))
        .map(_.getName)
    assert(redirects(a).isEmpty && redirects(b).isEmpty,
      s"${redirects(a)} / ${redirects(b)}")
    // stage files were reclaimed with the materialization, and the
    // decision file RETIRED with them (nothing references it once
    // every redirect is self-contained) — no per-transaction file
    // accumulates in the coordinator's directory
    Seq(a, b).foreach { d =>
      assert(new java.io.File(d).listFiles().forall(f =>
        !f.getName.startsWith("_txnstage-") &&
          !f.getName.startsWith("_txndecision-")), d)
    }
    assert(read(a).count() === 6L && read(b).count() === 6L)
  }

  test("vacuum on a table with a crashed (undecided) claim decides it " +
      "instead of wedging") {
    val a = freshDir("va")
    seed(a, 5)
    val txn = GdxSource.prepareTransaction(spark, Seq(
      GdxSource.GdxTxnWrite(a, Seq((50L, "x")).toDF("k", "v"))))
    // simulate the crashed preparer: nobody ever decides
    assert(GdxSource.vacuum(a, conf, keepLast = 3) >= 0) // must not throw
    assert(read(a).count() === 5L)
    // the vacuum's decision stands: the late commit is told it lost
    intercept[graft.sources.GdxConcurrentModificationException] {
      txn.commit()
    }
  }

  test("SQL front door: BEGIN TRANSACTION stages INSERTs invisibly, " +
      "COMMIT flips every table at once, ROLLBACK surfaces nothing, " +
      "and outside a transaction INSERT behaves natively") {
    val wh = graft.Scratch.tablePath("gdxtxn_sql_")
    val cat = "gdx_txnsql"
    val s = graft.Sessions.pinned(
      org.apache.spark.sql.graft.ColumnBridge
        .sessionWithExtensions(spark, new GraftExtensions()),
      s"spark.sql.catalog.$cat" -> "graft.sources.GdxCatalog",
      s"spark.sql.catalog.$cat.warehouse" -> wh)
    s.sql(s"CREATE NAMESPACE $cat.lab")
    s.sql(s"CREATE TABLE $cat.lab.facts (k BIGINT, v STRING)")
    s.sql(s"CREATE TABLE $cat.lab.audit (k BIGINT, v STRING)")
    // outside any transaction, INSERT is the native eager statement
    s.sql(s"INSERT INTO $cat.lab.facts VALUES (1, 'base')")
    assert(s.table(s"$cat.lab.facts").count() === 1L)
    // staged block: nothing surfaces on EITHER table until COMMIT
    s.sql("BEGIN TRANSACTION")
    s.sql(s"INSERT INTO $cat.lab.facts VALUES (2, 'f2'), (3, 'f3')")
    s.sql(s"INSERT INTO $cat.lab.audit SELECT k + 100, v " +
      s"FROM $cat.lab.facts VERSION AS OF 2 WHERE k = 1")
    s.sql(s"INSERT INTO $cat.lab.facts VALUES (4, 'f4')") // same table
    assert(s.table(s"$cat.lab.facts").count() === 1L,
      "staged rows leaked before COMMIT")
    assert(s.table(s"$cat.lab.audit").count() === 0L)
    val committed = s.sql("COMMIT").collect()
    assert(committed.length === 2) // one row per table
    assert(s.table(s"$cat.lab.facts").count() === 4L)
    assert(s.table(s"$cat.lab.audit").count() === 1L)
    assert(s.table(s"$cat.lab.audit").head.getLong(0) === 101L)
    // ROLLBACK: the staged write never surfaces anywhere
    s.sql("BEGIN TRANSACTION")
    s.sql(s"INSERT INTO $cat.lab.facts VALUES (-1, 'never')")
    s.sql("ROLLBACK")
    assert(s.table(s"$cat.lab.facts").filter("k = -1").count() === 0L)
    // empty transaction commits as a no-op
    s.sql("START TRANSACTION")
    assert(s.sql("COMMIT").collect().isEmpty)
    // loud refusals: double BEGIN, COMMIT with no transaction,
    // column-list INSERT inside a transaction
    s.sql("BEGIN TRANSACTION")
    intercept[Exception](s.sql("BEGIN TRANSACTION"))
    intercept[Exception](
      s.sql(s"INSERT INTO $cat.lab.facts (k, v) VALUES (9, 'x')"))
    // DML inside a transaction would commit OUTSIDE its atomicity —
    // refused loudly instead of silently half-transactional
    intercept[Exception](
      s.sql(s"DELETE FROM $cat.lab.facts WHERE k = 1"))
    intercept[Exception](
      s.sql(s"UPDATE $cat.lab.facts SET v = 'x' WHERE k = 1"))
    assert(s.table(s"$cat.lab.facts").filter("v = 'base'").count()
      === 1L, "refused DML must not have executed")
    s.sql("ROLLBACK")
    // after ROLLBACK the same DML runs normally
    s.sql(s"UPDATE $cat.lab.facts SET v = 'base2' WHERE k = 1")
    assert(s.table(s"$cat.lab.facts").filter("v = 'base2'").count()
      === 1L)
    intercept[Exception](s.sql("COMMIT"))
    intercept[Exception](s.sql("ROLLBACK"))
  }

  test("overwrite and append stage together; transact is the one-call " +
      "form") {
    val a = freshDir("oa"); val b = freshDir("ob")
    seed(a, 10); seed(b, 10)
    val out = GdxSource.transact(spark, Seq(
      GdxSource.GdxTxnWrite(a,
        Seq((1L, "fresh")).toDF("k", "v"), overwrite = true),
      GdxSource.GdxTxnWrite(b, Seq((99L, "more")).toDF("k", "v"))))
    assert(out.map(_._2) === Seq(2, 2))
    assert(read(a).count() === 1L) // truncate semantics
    assert(read(b).count() === 11L)
    assert(spark.read.format(fmt).option("path", a)
      .option("version", "1").load().count() === 10L)
  }
}
