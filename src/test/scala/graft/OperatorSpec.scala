package graft

import graft.operators.Multimodal
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

/** Cross-cutting operator semantics not covered by the DuckDB oracle. */
class OperatorSpec extends SparkSuite {
  import spark.implicits._

  test("Quantiles selection ≡ percentile aggregate, including ties/edges") {
    import graft.operators.Quantiles
    // duplicates, negative values, and a null; probs hitting exact ranks
    // (0, 1, median of even n) and interpolated positions
    val df = Seq[java.lang.Double](5.0, 1.0, 3.0, 3.0, -2.0, 9.0, 7.0, null)
      .toDF("x")
    val probs = Seq(0.0, 0.1, 0.25, 0.5, 0.9, 1.0)
    val got = Quantiles.exactQuantiles(df, "x", probs, parts = 3)
    val want = df.agg(expr(
      s"percentile(x, array(${probs.mkString(",")}))")).head.getSeq[Double](0)
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-12, s"got $got want $want") }
    // more partitions than rows (empty partitions on both flanks)
    val tiny = Seq(42.0).toDF("x")
    assert(Quantiles.exactQuantiles(tiny, "x", Seq(0.0, 0.5, 1.0), parts = 8)
      === Seq(42.0, 42.0, 42.0))
    // distinct-heavy column at sf0.001 against the aggregate
    val li = Tables.lineitem(spark, sf())
    val g2 = Quantiles.exactQuantiles(li, "l_extendedprice", Seq(0.05, 0.95))
    val w2 = li.agg(expr("percentile(l_extendedprice, array(0.05, 0.95))"))
      .head.getSeq[Double](0)
    g2.zip(w2).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-9 * math.abs(w), s"got $g2 want $w2") }
  }

  test("trimmedCorePerGroup ≡ per-group row_number window trim") {
    import graft.operators.Quantiles
    val W = org.apache.spark.sql.expressions.Window
    // groups of very different sizes incl. a 1-row and a 4-row group
    // (floor(n·0.1)=0 → nothing trimmed), duplicate cents values to
    // exercise the k1/k2 tie-break, more partitions than one group fills
    val rows = (1L to 200L).map(i => ("a", (i % 17) * 10, i, i % 3)) ++
      (1L to 40L).map(i => ("b", (i % 5) * 100, i, 0L)) ++
      Seq(("c", 7L, 1L, 0L)) ++
      (1L to 4L).map(i => ("d", 50L - i, i, 0L))
    val df = rows.toDF("g", "cents", "k1", "k2")
    val got = Quantiles.trimmedCorePerGroup(df, 0.1, parts = 8)
    val n = df.groupBy("g").agg(count(lit(1)).as("n"))
    val want = df.join(broadcast(n), "g")
      .withColumn("rn", row_number().over(W.partitionBy("g")
        .orderBy(col("cents"), col("k1"), col("k2"))))
      .filter(col("rn") > floor(col("n") * 0.1) &&
        col("rn") <= col("n") - floor(col("n") * 0.1))
      .groupBy("g")
      .agg(count(lit(1)).as("n_core"), sum("cents").as("s"))
      .orderBy("g")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === want)
    assert(got.find(_._1 == "c").get._2 === 1L, "1-row group keeps its row")
    assert(got.find(_._1 == "d").get._2 === 4L, "n=4, frac=0.1 trims none")
  }

  test("multimodal: histogram normalized, frames sampled, bytes intact") {
    val media = Multimodal.mediaTable(spark, sf())
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 500)
    feats.take(20).foreach { f =>
      assert(math.abs(f.histogram.sum - 1.0) < 1e-9, "histogram must sum to 1")
      assert(f.n_frames === 1 + f.n_bytes / 256)
    }
    val m0 = media.filter(col("doc_id") === 0).collect().head
    val d0 = Tables.documents(spark, sf())
      .filter(col("doc_id") === 0).select("text").as[String].head()
    assert(new String(m0.media, "UTF-8") === d0, "payload bytes round-trip")
    val frames = Multimodal.sampleFrames(media)
    assert(frames.count() > 0 &&
      frames.filter(col("frame_idx") % 4 =!= 0).count() === 0)
  }

  test("PNG codec kernel: header, per-pixel gradient, and filter pass") {
    // id=3 -> 19×19 (16+3, 16+3): every decoded pixel must reproduce the
    // gradient exactly — a wrong row order, channel order, or PNG filter
    // reconstruction shows up as a wrong sum or pixel.
    val bytes = Multimodal.pngBytes(3L)
    assert(bytes.take(8).map(_ & 0xFF).toSeq ===
      Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A), "PNG magic")
    val (w, h, sr, sg, sb) = Multimodal.decodePng(bytes)
    assert((w, h) === (19L, 19L))
    assert(sr === h * (w * (w - 1)) / 2)
    assert(sg === w * (h * (h - 1)) / 2)
    assert(sb === w * h * 3)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert((img.getRGB(7, 11) & 0xFFFFFF) === ((7 << 16) | (11 << 8) | 3))
  }

  test("WAV codec kernel: RIFF header fields and exact PCM fold") {
    // id=5 -> 4096 + 5*256 = 5376 samples; ramp sum = -128 * n/256
    val bytes = Multimodal.wavBytes(5L)
    assert(new String(bytes.take(4), "US-ASCII") === "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE")
    val (rate, n, sum, mn, mx) = Multimodal.decodeWav(bytes)
    assert(rate === 8000L && n === 5376L)
    assert(sum === -128L * (n / 256))
    assert(mn === -128L && mx === 127L)
  }

  test("aHash: invariant under a 1-pixel edit, separates distinct images") {
    def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val grad = (x: Int, y: Int) => ((x * 4) << 16) | ((y * 4) << 8)
    val base = png(64, 64, grad)
    // near-dup: one pixel blown out — block means barely move
    val edited = png(64, 64, (x, y) =>
      if (x == 10 && y == 10) 0xFFFFFF else grad(x, y))
    // near-dup at a different resolution: same image upscaled
    val scaled = png(128, 128, (x, y) => grad(x / 2, y / 2))
    // genuinely different: the inverted gradient
    val inverted = png(64, 64, (x, y) => grad(63 - x, 63 - y))
    val hBase = Multimodal.aHash64(base)
    assert(Multimodal.aHash64(edited) === hBase,
      "1-pixel edit must not change the aHash")
    assert(Multimodal.aHash64(scaled) === hBase,
      "2x upscale must not change the aHash")
    assert(Multimodal.aHash64(inverted) !== hBase,
      "inverted image must hash differently")
    // the exact-dup structure of the id-gradient corpus: ids equal
    // mod 256 produce identical images, hence identical hashes
    assert(Multimodal.aHash64(Multimodal.pngBytes(7L)) ===
      Multimodal.aHash64(Multimodal.pngBytes(263L)))
  }

  test("streaming tumbling agg equals batch equivalent") {
    val streamed = SparkEntry.queries("stream_tumbling_daily")(spark, sf())
      .select("day", "event_type", "n_events").as[(java.sql.Timestamp, String, Long)]
      .collect().toSet
    val batch = Tables.events(spark, sf())
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("streaming dedup within watermark drops re-delivered keys") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val deduped = input.toDF().toDF("id", "k", "v")
      .withColumn("ts", expr("timestamp_micros(CAST(id * 1000000 AS LONG))"))
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("k")
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_wm").outputMode("append").start()
    input.addData((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
    q.processAllAvailable()
    input.addData((4L, "a", 4.0)) // still within watermark → dropped
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_wm").select("k").as[String].collect().sorted
    assert(out.toSeq === Seq("a", "b"))
  }

  test("w2 rolling window is row-based, not range-based") {
    // two rows share nothing about calendar spacing: 7-ROW frame must
    // average exactly the last ≤7 ROWS even with multi-day gaps
    val rows = SparkEntry.queries("w2_rolling_avg7")(spark, sf())
      .filter(col("user_id") === 1).orderBy("ts").limit(8)
      .select("value", "roll_avg").as[(Double, Double)].collect()
    val vals = rows.map(_._1)
    rows.zipWithIndex.foreach { case ((_, roll), i) =>
      val window = vals.slice(math.max(0, i - 6), i + 1)
      assert(math.abs(roll - window.sum / window.length) < 1e-9)
    }
  }
}
