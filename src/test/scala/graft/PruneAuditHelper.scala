package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions.col

/** Shared DSv2 column-pruning audit, applied to every custom source
  * spec. The invariant: for EVERY column subset (and non-base ordering)
  * a query may request, the rows a scan delivers must match the schema
  * it advertises via readSchema(). The failure class this guards
  * against is a ScanBuilder that ACCEPTS pruneColumns (so readSchema
  * reports the pruned schema) while its reader keeps emitting
  * fixed-position full rows — right by position-luck for prefix
  * subsets, ClassCastException for the rest, and invisible to any test
  * that only ever selects all columns. */
trait PruneAuditHelper { self: SparkSuite =>

  /** Audits `fresh()` (a full-schema scan of the source under test):
    * every subset of its columns, in base and reversed order, must
    * (a) reach the physical scan pruned — no dropped column survives in
    * any BatchScanExec's output — and (b) collect to exactly the
    * projection of the full scan's rows. Also exercises the
    * pruned-to-minimal extreme via count(). */
  def auditColumnPruning(fresh: () => DataFrame): Unit = {
    val full = fresh()
    val colsAll = full.schema.fieldNames.toSeq
    val byName = colsAll.zipWithIndex.toMap
    val fullRows = full.collect().map(_.toSeq).toSeq
    val selections = (1 to colsAll.size)
      .flatMap(n => colsAll.combinations(n))
      .flatMap(c => Seq(c, c.reverse).distinct)
    for (sel <- selections) {
      val df = fresh().select(sel.map(col): _*)
      assert(df.schema.fieldNames.toSeq === sel,
        s"select(${sel.mkString(",")}) must report exactly those columns")
      val scans = df.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b
      }
      assert(scans.nonEmpty, "audit expects a DSv2 BatchScanExec")
      scans.foreach { b =>
        assert(b.output.map(_.name).toSet.subsetOf(sel.toSet),
          s"scan output ${b.output.map(_.name)} leaks a column " +
            s"${sel.mkString(",")} never asked for — pruning did not " +
            "reach the scan")
      }
      val got = df.collect().map(_.toSeq).sortBy(_.mkString(""))
      val want = fullRows.map(row => sel.map(c => row(byName(c))))
        .sortBy(_.mkString(""))
      assert(got === want,
        s"pruned read (${sel.mkString(",")}) disagrees with the full scan")
    }
    assert(fresh().count() === fullRows.size.toLong,
      "a count()-shaped (maximally pruned) scan must still see every row")
  }
}
