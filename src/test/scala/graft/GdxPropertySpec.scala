package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the GDX line format: round-trip fidelity across
  * arbitrary valid payloads, null patterns, and schema evolution. The
  * format's contract is exact value preservation for long/string/double
  * plus \N-marked NULLs; the generators range over everything the write
  * path accepts (strings sans tab/newline/\N — the writer rejects those
  * loudly, which write-rejection cases pin). */
class GdxPropertySpec extends SparkSuite {

  /** scalatestplus isn't in the offline cache: drive Gen directly with
    * fixed seeds (deterministic across runs). */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxprop_$tag").toString

  private val fmt = "graft.sources.GdxSource"

  // printable-ish strings the unescaped line format accepts; includes
  // unicode, spaces, empty, and near-miss marker strings
  private val vGen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr.map(_.filterNot(c => c == '\t' || c == '\n' ||
      c == '\r')).suchThat(_ != "\\N"),
    Gen.oneOf("", " ", "héllo wörld", "\\n", "\\\\N", "N\\", "日本語",
      "a b c", "\"quoted\"", "x" * 200))

  private val rowGen: Gen[(Long, String, Option[Double])] = for {
    k <- Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)
    v <- vGen
    w <- Gen.option(Gen.oneOf(Gen.chooseNum(-1e12, 1e12),
      Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, 1.0 / 3.0,
        math.Pi, 1e-300, -1e300)))
  } yield (k, v, w)

  test("property: (k, v) round-trips exactly through write + scan") {
    for (rows <- samples(Gen.listOfN(30, rowGen.map(r => (r._1, r._2))), 10)
         if rows.map(_._1).distinct.size == rows.size) {
      {
        val dir = freshDir("rt")
        rows.toDF("k", "v").repartition(3)
          .write.format(fmt).option("path", dir).mode("append").save()
        val got = spark.read.format(fmt).option("path", dir).load()
          .as[(Long, String)].collect().toSet
        assert(got === rows.toSet)
      }
    }
  }

  test("property: evolved rows round-trip doubles and NULLs exactly") {
    for (rows <- samples(Gen.listOfN(25, rowGen), 10)
         if rows.map(_._1).distinct.size == rows.size) {
      {
        val dir = freshDir("evo")
        // seed classic, evolve, append the full payload
        Seq((Long.MinValue + 1, "seed")).toDF("k", "v")
          .write.format(fmt).option("path", dir).mode("overwrite").save()
        sources.GdxSource.addColumn(dir, "w",
          org.apache.spark.sql.types.DoubleType)
        rows.toDF("k", "v", "w").repartition(2)
          .write.format(fmt).option("path", dir).mode("append").save()
        val got = spark.read.format(fmt).option("path", dir).load()
          .filter(col("v") =!= "seed")
          .as[(Long, String, Option[Double])].collect().toSet
        // doubles must round-trip BIT-exactly (toString/toDouble), so
        // compare raw bits, not numeric equality (NaN-safe, -0.0-safe)
        def bits(r: (Long, String, Option[Double])) =
          (r._1, r._2, r._3.map(java.lang.Double.doubleToRawLongBits))
        assert(got.map(bits) === rows.toSet.map(bits))
      }
    }
  }

  test("property: nested struct cells round-trip exactly — scalars, " +
      "nulls at every level, nested structs, unicode leaf strings") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val meta = StructType(Seq(
      StructField("s", DoubleType),
      StructField("inner", StructType(Seq(
        StructField("a", StringType),
        StructField("b", LongType)))),
      StructField("t", LongType)))
    // leaf strings under the struct vocabulary (no , ( ) tab/newline)
    val leafGen: Gen[String] = Gen.oneOf(
      Gen.asciiPrintableStr.map(_.filterNot(c => c == '\t' ||
        c == '\n' || c == '\r' || c == ',' || c == '(' || c == ')'))
        .suchThat(_ != "\\N"),
      Gen.oneOf("", " ", "N", "\\", "\\n", "=x=", "日本語テキスト",
        "naïve café", "a:b<c>d"))
    val cellGen: Gen[Row] = for {
      sOpt <- Gen.option(Gen.chooseNum(-1e9, 1e9))
      innerNull <- Gen.prob(0.2)
      aOpt <- Gen.option(leafGen)
      bOpt <- Gen.option(Gen.chooseNum(Long.MinValue / 2,
        Long.MaxValue / 2))
      tOpt <- Gen.option(Gen.chooseNum(-1000000L, 1000000L))
    } yield Row(
      sOpt.map(Double.box).orNull,
      if (innerNull) null
      else Row(aOpt.orNull, bOpt.map(Long.box).orNull),
      tOpt.map(Long.box).orNull)
    val metaGen: Gen[Row] = Gen.oneOf(
      cellGen, Gen.const(null.asInstanceOf[Row]))
    val rows = samples(metaGen, 300).zipWithIndex.map {
      case (m, i) => Row(i.toLong, s"v$i", m) }
    val dir = freshDir("struct") + "/t"
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType), StructField("meta", meta)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val back = spark.read.format(fmt).option("path", dir).load()
      .orderBy("k").collect()
    val want = rows.sortBy(_.getLong(0))
    assert(back.length === want.length)
    back.zip(want).foreach { case (g, w) =>
      assert(g.get(2) === w.get(2), s"row ${w.getLong(0)}") }
    // the DML substrate's external decode agrees with the scan's
    val viaLive = graft.sources.GdxSource
      .tableChanges(spark, dir, 0, 1).orderBy("k").collect()
    viaLive.zip(want).foreach { case (g, w) =>
      assert(g.getAs[Any]("meta") === w.get(2),
        s"external row ${w.getLong(0)}") }
  }

  test("property: array<struct> cells round-trip exactly — variable " +
      "lengths, empty arrays, NULL cells, null element leaves") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val leafGen: Gen[String] = Gen.oneOf(
      Gen.asciiPrintableStr.map(_.filterNot(c => c == '\t' ||
        c == '\n' || c == '\r' || c == ',' || c == '(' || c == ')'))
        .suchThat(_ != "\\N"),
      Gen.oneOf("", " ", "N", "\\", "=x=", "日本語", "a:b<c>d"))
    val turn = StructType(Seq(StructField("role", StringType),
      StructField("content", StringType), StructField("n", LongType)))
    val turnGen: Gen[Row] = for {
      r <- Gen.option(leafGen)
      c <- Gen.option(leafGen)
      n <- Gen.option(Gen.chooseNum(-1000000L, 1000000L))
    } yield Row(r.orNull, c.orNull, n.map(Long.box).orNull)
    val msgsGen: Gen[Seq[Row]] = Gen.oneOf(
      Gen.chooseNum(0, 5).flatMap(n => Gen.listOfN(n, turnGen))
        .map(_.toSeq),
      Gen.const(null.asInstanceOf[Seq[Row]]))
    val rows = samples(msgsGen, 300).zipWithIndex.map {
      case (m, i) => Row(i.toLong, s"v$i", m) }
    val dir = freshDir("arrstruct") + "/t"
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType),
      StructField("messages", ArrayType(turn))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val back = spark.read.format(fmt).option("path", dir).load()
      .orderBy("k").collect()
    val want = rows.sortBy(_.getLong(0))
    assert(back.length === want.length)
    back.zip(want).foreach { case (g, w) =>
      val gm = Option(g.getSeq[Row](2)).map(_.toSeq).orNull
      assert(gm === w.get(2), s"row ${w.getLong(0)}") }
    // the DML substrate's external decode agrees with the scan's
    graft.sources.GdxSource.tableChanges(spark, dir, 0, 1)
      .orderBy("k").collect().zip(want).foreach { case (g, w) =>
        val gm = Option(g.getAs[scala.collection.Seq[Row]]("messages"))
          .map(_.toSeq).orNull
        assert(gm === w.get(2), s"external row ${w.getLong(0)}") }
  }

  test("property: map cells round-trip exactly — string values keep " +
      "the full paren vocabulary, struct values nest") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val keyGen: Gen[String] = Gen.asciiPrintableStr
      .map(_.filterNot(c => c == '\t' || c == '\n' || c == '\r' ||
        c == ',' || c == '='))
      .suchThat(_ != "\\N")
    // string-map VALUES may carry parens — the vocabulary class the
    // depth splitter must never be applied to
    val sValGen: Gen[String] = Gen.oneOf(
      Gen.asciiPrintableStr.map(_.filterNot(c => c == '\t' ||
        c == '\n' || c == '\r' || c == ',')).suchThat(_ != "\\N"),
      Gen.oneOf("x(y", "z)w", "((", "))(", "a=b", ""))
    val smGen: Gen[Map[String, String]] = Gen.chooseNum(0, 6)
      .flatMap(n => Gen.mapOfN(n, Gen.zip(keyGen, sValGen)))
    val smRows = samples(smGen, 200).zipWithIndex.map {
      case (m, i) => Row(i.toLong, m) }
    val smDir = freshDir("smap") + "/t"
    spark.createDataFrame(
      spark.sparkContext.parallelize(smRows, 4),
      StructType(Seq(StructField("k", LongType),
        StructField("m", MapType(StringType, StringType)))))
      .write.format(fmt).option("path", smDir).mode("overwrite").save()
    spark.read.format(fmt).option("path", smDir).load()
      .orderBy("k").collect()
      .zip(smRows.sortBy(_.getLong(0))).foreach { case (g, w) =>
        assert(g.getMap[String, String](1).toMap ===
          w.getMap[String, String](1), s"string map ${w.getLong(0)}") }
    // struct-valued: keys additionally ban parens (depth splitter)
    val svKeyGen = keyGen.map(_.filterNot(c => c == '(' || c == ')'))
    val cell = StructType(Seq(StructField("v", DoubleType),
      StructField("n", LongType)))
    val svGen: Gen[Map[String, Row]] = Gen.chooseNum(0, 5)
      .flatMap(n => Gen.mapOfN(n, Gen.zip(svKeyGen, for {
        v <- Gen.option(Gen.chooseNum(-1e9, 1e9))
        m <- Gen.option(Gen.chooseNum(-1000000L, 1000000L))
      } yield Row(v.map(Double.box).orNull, m.map(Long.box).orNull))))
    val svRows = samples(svGen, 200).zipWithIndex.map {
      case (m, i) => Row(i.toLong, m) }
    val svDir = freshDir("svmap") + "/t"
    spark.createDataFrame(
      spark.sparkContext.parallelize(svRows, 4),
      StructType(Seq(StructField("k", LongType),
        StructField("m", MapType(StringType, cell)))))
      .write.format(fmt).option("path", svDir).mode("overwrite").save()
    spark.read.format(fmt).option("path", svDir).load()
      .orderBy("k").collect()
      .zip(svRows.sortBy(_.getLong(0))).foreach { case (g, w) =>
        assert(g.getMap[String, Row](1).toMap ===
          w.getMap[String, Row](1), s"struct map ${w.getLong(0)}") }
  }

  test("write rejects line-format-breaking strings loudly") {
    for (bad <- Seq("a\tb", "a\nb", "a\rb", "\\N")) {
      val dir = freshDir("rej")
      val e = intercept[Exception] {
        Seq((1L, bad)).toDF("k", "v")
          .write.format(fmt).option("path", dir).mode("append").save()
      }
      def causes(t: Throwable): Seq[Throwable] =
        t +: Option(t.getCause).toSeq.flatMap(causes)
      assert(causes(e).exists(c => Option(c.getMessage)
        .exists(m => m.contains("must not contain") ||
          m.contains("marker"))), s"for ${bad.replace("\t", "<TAB>")}: $e")
      // the failed write must not have published a manifest
      assert(sources.GdxSource.listVersions(dir,
        sources.GdxSource.driverConf()).isEmpty)
    }
  }
}
