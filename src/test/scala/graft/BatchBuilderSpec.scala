package graft

import graft.serve.BatchBuilder
import graft.functors.{AgeFunctor, TimeOfDayFunctor, TimeDependentFunctor}
import graft.ops.Multimodal
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Batch construction (reference event_stream_pytorch_dataset.py) +
  * functors + multimodal plumbing. */
class BatchBuilderSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("buildOffsets: event_type pinned at idx 1 offset 1, contiguous") {
    val offs = BatchBuilder.buildOffsets(
      Seq(("lab", 5L), ("event_type", 3L), ("dx", 7L)))
    assert(offs.map(_.measurement) == Seq("event_type", "dx", "lab"))
    assert(offs.map(_.measurementIdx) == Seq(1, 2, 3))
    assert(offs.map(_.offset) == Seq(1L, 4L, 11L))
  }

  test("subjectSequences: ragged arrays ordered by time") {
    val events = Seq(
      (0L, 1L, ts("2024-01-01 00:10:00"), "A"),
      (1L, 1L, ts("2024-01-01 00:00:00"), "B"),
      (2L, 2L, ts("2024-01-01 00:00:00"), "A"))
      .toDF("event_id", "subject_id", "timestamp", "event_type")
    val meas = Seq(
      (0L, 2L, Some(1.5), 1L), (0L, 3L, None, 1L), (1L, 4L, Some(2.5), 1L))
      .toDF("event_id", "unified_idx", "value", "measurement_idx")
    val out = BatchBuilder.subjectSequences(events, meas)
      .orderBy("subject_id")
      .select("subject_id", "time", "dynamic_indices", "dynamic_values")
      .as[(Long, Seq[Double], Seq[Seq[Long]], Seq[Seq[Option[Double]]])]
      .collect()
    val s1 = out(0)
    assert(s1._1 == 1L)
    assert(s1._2 == Seq(0.0, 10.0)) // minutes from sequence start
    assert(s1._3 == Seq(Seq(4L), Seq(2L, 3L))) // B's event first
    assert(s1._4 == Seq(Seq(Some(2.5)), Seq(Some(1.5), None)))
    val s2 = out(1)
    assert(s2._2 == Seq(0.0) && s2._3 == Seq(Seq[Long]()))
  }

  test("subjectSequences: minSeqLen filter and window truncation") {
    val events = (0 until 10).map(i =>
      (i.toLong, 1L, ts(f"2024-01-01 00:0$i:00"), "A")) :+
      (10L, 2L, ts("2024-01-01 00:00:00"), "A")
    val ev = events.toDF("event_id", "subject_id", "timestamp", "event_type")
    val meas = Seq.empty[(Long, Long, Option[Double], Long)]
      .toDF("event_id", "unified_idx", "value", "measurement_idx")
    val out = BatchBuilder.subjectSequences(ev, meas,
      maxSeqLen = 4, minSeqLen = 2, seed = 7)
    val rows = out.select("subject_id", "time")
      .as[(Long, Seq[Double])].collect().toMap
    assert(!rows.contains(2L)) // below minSeqLen
    assert(rows(1L).length == 4) // truncated to window
    // deterministic for fixed seed
    val again = BatchBuilder.subjectSequences(ev, meas,
      maxSeqLen = 4, minSeqLen = 2, seed = 7)
      .select("subject_id", "time").as[(Long, Seq[Double])].collect().toMap
    assert(again(1L) == rows(1L))
  }

  test("subjectSequences: windowU overrides the slice start exactly") {
    // 8 events at minute i², window 4: u = 0.5 → start =
    // floor(0.5 · (8−4+1)) + 1 = 3, so the slice is events 3..6
    // (minutes 4, 9, 16, 25) and time re-zeroes on minute 4.
    val events = (0 until 8).map(i =>
      (i.toLong, 1L, ts(f"2024-01-01 00:${i * i}%02d:00"), "A"))
    val ev = events.toDF("event_id", "subject_id", "timestamp", "event_type")
    val meas = Seq.empty[(Long, Long, Option[Double], Long)]
      .toDF("event_id", "unified_idx", "value", "measurement_idx")
    val rows = BatchBuilder.subjectSequences(ev, meas, maxSeqLen = 4,
        windowU = Some(lit(0.5)))
      .select("subject_id", "time").as[(Long, Seq[Double])].collect().toMap
    assert(rows(1L) == Seq(0.0, 5.0, 12.0, 21.0))
  }

  test("taskWindows: interval join restricts to [start, end]") {
    val events = Seq(
      (0L, 1L, ts("2024-01-01 00:00:00"), "A"),
      (1L, 1L, ts("2024-01-05 00:00:00"), "A"),
      (2L, 1L, ts("2024-02-01 00:00:00"), "A"))
      .toDF("event_id", "subject_id", "timestamp", "event_type")
    val tasks = Seq((1L, ts("2024-01-01 00:00:00"),
      ts("2024-01-10 00:00:00"), "y1"))
      .toDF("task_subject_id", "start_time", "end_time", "label")
    val joined = BatchBuilder.taskWindows(events, tasks)
    assert(joined.count() == 2)
    assert(joined.select("label").distinct().as[String].collect().toSeq
      == Seq("y1"))
  }

  test("padTo pads ragged arrays on either side") {
    val df = Seq(Seq(1.0, 2.0)).toDF("a")
    val r = df.select(
      BatchBuilder.padTo(col("a"), 4).as("right"),
      BatchBuilder.padTo(col("a"), 4, leftPad = true).as("left"))
      .as[(Seq[Option[Double]], Seq[Option[Double]])].collect().head
    assert(r._1 == Seq(Some(1.0), Some(2.0), None, None))
    assert(r._2 == Seq(None, None, Some(1.0), Some(2.0)))
  }

  test("functors: age and time-of-day expressions") {
    val events = Seq((1L, ts("2024-01-01 05:00:00")),
      (1L, ts("2024-01-01 13:00:00")), (1L, ts("2024-01-01 22:00:00")))
      .toDF("subject_id", "timestamp")
    val subjects = Seq((1L, ts("2004-01-01 00:00:00")))
      .toDF("subject_id", "dob")
    val out = TimeDependentFunctor.addColumns(events, subjects,
      Seq(AgeFunctor("dob"), TimeOfDayFunctor()))
    val rows = out.select("age", "time_of_day")
      .as[(Double, String)].collect()
    assert(rows.forall(r => math.abs(r._1 - 20.0) < 0.1))
    assert(rows.map(_._2).toSeq == Seq("EARLY_AM", "PM", "LATE_PM"))
  }

  test("withPngMetadata: IHDR sniff matches the real encoder's dims " +
    "without decoding; corrupt payload flags, never throws") {
    val ids = Seq(Tuple1(3L), Tuple1(20L)).toDF("doc_id")
    val media = Multimodal.synthesizeImages(ids, "doc_id")
      .select(col("media_id"), col("payload"))
      .unionByName(Seq((99L, "garbage".getBytes("UTF-8")))
        .toDF("media_id", "payload"))
    val got = Multimodal.withPngMetadata(media, "payload")
      .select("media_id", "png_valid", "png_width", "png_height",
        "png_bit_depth", "png_color_type")
      .as[(Long, Boolean, Option[Long], Option[Long], Option[Long],
        Option[Long])].collect().map(r => r._1 -> r).toMap
    for (id <- Seq(3L, 20L)) {
      val r = got(id)
      assert(r._2 && r._3 == Some(Multimodal.imgW(id).toLong) &&
        r._4 == Some(Multimodal.imgH(id).toLong))
      assert(r._5 == Some(8L) && r._6 == Some(2L)) // 8-bit truecolor
    }
    assert(got(99L) == ((99L, false, None, None, None, None)))
  }

  test("multimodal REAL codec: red-channel histogram matches the pixel " +
    "formula, zeros kept") {
    val ids = Seq(Tuple1(5L), Tuple1(12L)).toDF("doc_id")
    val imgs = Multimodal.synthesizeImages(ids, "doc_id")
    val hists = Multimodal.decodeImageHistogram(imgs, bins = 8)
      .as[Multimodal.ImageHistogram].collect()
      .map(h => h.media_id -> h).toMap
    for (id <- Seq(5L, 12L)) {
      val (w, h) = (Multimodal.imgW(id), Multimodal.imgH(id))
      assert(hists(id).n_px == w * h)
      val expect = new Array[Long](8)
      for (y <- 0 until h; x <- 0 until w)
        expect(Multimodal.pxR(id, x, y) >> 5) += 1
      assert(hists(id).hist.toSeq == expect.toSeq)
      assert(hists(id).hist.length == 8) // zero bins survive
    }
  }

  test("multimodal raster transfer: grabRgb/putRgb match a per-pixel " +
    "getRGB walk on every decoded layout") {
    // The bulk-raster paths (direct DataBufferInt / DataBufferByte reads,
    // bulk-getRGB fallback) replaced per-pixel getRGB/setRGB — pixel
    // semantics must be bit-identical or the seven media oracle hashes
    // move. Exercise all three layouts: TYPE_INT_RGB (constructed),
    // TYPE_3BYTE_BGR (JDK PNG reader), TYPE_BYTE_INDEXED (GIF reader).
    def perPixel(img: java.awt.image.BufferedImage): Array[Int] = {
      val (w, h) = (img.getWidth, img.getHeight)
      Array.tabulate(w * h)(i => img.getRGB(i % w, i / w) & 0xffffff)
    }
    def viaGrab(img: java.awt.image.BufferedImage): Array[Int] =
      Multimodal.grabRgb(img, null)
        .take(img.getWidth * img.getHeight).map(_ & 0xffffff)
    // constructed TYPE_INT_RGB, written through putRgb
    val rgb = new java.awt.image.BufferedImage(7, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val pix = Array.tabulate(35)(i => (i * 2654435761L).toInt & 0xffffff)
    Multimodal.putRgb(rgb, pix)
    assert(perPixel(rgb).toSeq == pix.toSeq)
    assert(viaGrab(rgb).toSeq == pix.toSeq)
    // PNG round-trip (the reader returns an interleaved BGR raster)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "png", baos)
    val png = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(baos.toByteArray))
    assert(viaGrab(png).toSeq == perPixel(png).toSeq)
    assert(viaGrab(png).toSeq == pix.toSeq) // PNG is lossless
    // GIF round-trip (indexed raster → bulk-getRGB fallback); grayscale
    // ≤256-color content palettizes losslessly. Production frame dims
    // (16×12) — the JDK's default interlaced GIF write scrambles rows on
    // images under ~8 rows tall (a writer quirk, verified independent of
    // the raster-transfer paths; synthesizeGifs frames are all ≥12 rows).
    val gray = new java.awt.image.BufferedImage(16, 12,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gpix = Array.tabulate(16 * 12) { i =>
      val v = (i * 11) % 256; (v << 16) | (v << 8) | v
    }
    Multimodal.putRgb(gray, gpix)
    val gb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gray, "gif", gb)
    val gif = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gb.toByteArray))
    assert(viaGrab(gif).toSeq == perPixel(gif).toSeq)
    assert(viaGrab(gif).toSeq == gpix.toSeq)
  }

  test("multimodal REAL codec: variable-frame GIF containers count " +
    "correctly through a stride-1 read") {
    val ids = Seq(Tuple1(1L), Tuple1(2L), Tuple1(3L), Tuple1(4L))
      .toDF("doc_id")
    val gifs = Multimodal.synthesizeGifs(ids, "doc_id", nFrames = 3,
      varyMod = 4)
    val counts = Multimodal.sampleGifFrames(gifs, stride = 1)
      .groupBy("media_id").count().as[(Long, Long)].collect().toMap
    for (id <- 1L to 4L) assert(counts(id) == 3 + id % 4)
    // varyMod = 1 (default) keeps the fixed-length behavior bit-identical
    val fixed = Multimodal.sampleGifFrames(
      Multimodal.synthesizeGifs(ids, "doc_id", nFrames = 3), stride = 1)
      .groupBy("media_id").count().as[(Long, Long)].collect().toMap
    assert(fixed.values.forall(_ == 3L))
  }

  test("multimodal REAL codec: progressive two-stage resize composes " +
    "the nearest-neighbor index math") {
    val ids = Seq(Tuple1(9L)).toDF("doc_id")
    val imgs = Multimodal.synthesizeImages(ids, "doc_id")
    val r2 = Multimodal.resizeNearest(
      Multimodal.resizeNearest(imgs, dstW = 12, dstH = 10),
      dstW = 6, dstH = 5)
    val f = Multimodal.decodeImageFeatures(r2)
      .as[Multimodal.ImageFeatures].collect().head
    assert(f.width == 6 && f.height == 5)
    val (w, h) = (Multimodal.imgW(9L), Multimodal.imgH(9L))
    val expected = (for (y <- 0 until 5; x <- 0 until 6) yield {
      val (sx, sy) = ((2 * x) * w / 12, (2 * y) * h / 10)
      Multimodal.pxR(9L, sx, sy)
    }).sum / 30.0
    assert(math.abs(f.mean_r - expected) < 1e-9)
  }

  test("multimodal REAL codec: animated-GIF frame sampling recovers " +
    "the per-frame formula exactly") {
    val ids = Seq(Tuple1(3L), Tuple1(41L), Tuple1(7L)).toDF("doc_id")
    val gifs = Multimodal.synthesizeGifs(ids, "doc_id", nFrames = 6)
    // payloads are genuine GIF89a containers
    val pay = gifs.select("media_id", "payload")
      .as[(Long, Array[Byte])].collect().toMap
    assert(pay.values.forall(p => p(0) == 'G' && p(1) == 'I' &&
      p(2) == 'F' && p(3) == '8' && p(4) == '9' && p(5) == 'a'))
    val fr = Multimodal.sampleGifFrames(gifs, stride = 2)
      .as[Multimodal.GifFrame].collect()
      .map(x => (x.media_id, x.frame_idx) -> x).toMap
    // every id samples frames 0, 2, 4 of its 6
    assert(fr.keySet == Set(3L, 41L, 7L)
      .flatMap(id => Seq(0, 2, 4).map(f => id -> f)))
    for { id <- Seq(3L, 41L, 7L); f <- Seq(0, 2, 4) } {
      val (w, h) = (Multimodal.gifW(id), Multimodal.gifH(id))
      val got = fr((id, f))
      assert(got.width == w && got.height == h)
      val want = (for { y <- 0 until h; x <- 0 until w }
        yield Multimodal.gifV(id, f, x, y)).sum.toDouble / (w * h)
      assert(got.mean_gray == want) // lossless palette: exact
    }
  }

  test("multimodal REAL codec: PNG round-trip recovers the formula raster") {
    val ids = Seq(Tuple1(3L), Tuple1(40L), Tuple1(123L)).toDF("doc_id")
    val imgs = Multimodal.synthesizeImages(ids, "doc_id")
    // payloads are genuine PNGs (magic bytes)
    val pay = imgs.select("media_id", "payload")
      .as[(Long, Array[Byte])].collect().toMap
    assert(pay.values.forall(p =>
      (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G'))
    // decode recovers dims and the exact per-channel means of the formula
    val f = Multimodal.decodeImageFeatures(imgs)
      .as[Multimodal.ImageFeatures].collect().map(x => x.media_id -> x).toMap
    for (id <- Seq(3L, 40L, 123L)) {
      val (w, h) = (Multimodal.imgW(id), Multimodal.imgH(id))
      assert(f(id).width == w && f(id).height == h)
      val want = (for { y <- 0 until h; x <- 0 until w }
        yield Multimodal.pxR(id, x, y)).sum.toDouble / (w * h)
      assert(f(id).mean_r == want) // lossless: exact, not approximate
    }
    // nearest-neighbor resize: dims change, pixels follow the index math
    val rs = Multimodal.decodeImageFeatures(
      Multimodal.resizeNearest(imgs, dstW = 8, dstH = 6))
      .as[Multimodal.ImageFeatures].collect().map(x => x.media_id -> x).toMap
    for (id <- Seq(3L, 40L, 123L)) {
      assert(rs(id).width == 8 && rs(id).height == 6)
      val (w, h) = (Multimodal.imgW(id), Multimodal.imgH(id))
      val want = (for { y <- 0 until 6; x <- 0 until 8 }
        yield Multimodal.pxG(id, x * w / 8, y * h / 6)).sum / 48.0
      assert(rs(id).mean_g == want)
    }
  }

  test("multimodal REAL audio codec: WAV round-trip recovers the PCM stream") {
    val ids = Seq(Tuple1(5L), Tuple1(77L)).toDF("doc_id")
    val wavs = Multimodal.synthesizeAudio(ids, "doc_id")
    // payloads are genuine RIFF/WAVE containers
    val pay = wavs.select("media_id", "payload")
      .as[(Long, Array[Byte])].collect().toMap
    assert(pay.values.forall(p => new String(p.take(4)) == "RIFF" &&
      new String(p.slice(8, 12)) == "WAVE"))
    val f = Multimodal.decodeAudioFeatures(wavs)
      .as[Multimodal.AudioFeatures].collect().map(x => x.media_id -> x).toMap
    for (id <- Seq(5L, 77L)) {
      val n = Multimodal.pcmN(id)
      val smp = (0 until n).map(i => Multimodal.pcmSample(id, i))
      assert(f(id).n_samples == n && f(id).sample_rate == 8000)
      assert(f(id).rms ==
        math.sqrt(smp.map(s => s.toLong * s).sum.toDouble / n))
      assert(f(id).zero_crossings ==
        smp.sliding(2).count(p => p.head.toLong * p.last < 0))
      assert(f(id).mean_amp == smp.map(s => math.abs(s).toLong).sum.toDouble / n)
    }
  }

  test("multimodal dHash: formula reference, recode invariance, banded " +
    "pairs = brute-force Hamming") {
    val ids = spark.range(0, 12).toDF("doc_id")
    val imgs = Multimodal.synthesizeImages(ids, "doc_id")
    val got = Multimodal.dHash(imgs)
      .as[Multimodal.DHashRow].collect().map(r => r.media_id -> r).toMap
    // driver-side reference straight from the pixel formulas
    def gray(id: Long, x: Int, y: Int): Int =
      (Multimodal.pxR(id, x, y) + Multimodal.pxG(id, x, y) +
        Multimodal.pxB(id, x, y)) / 3
    def refHash(id: Long): (Long, Long) = {
      val (w, h) = (Multimodal.imgW(id), Multimodal.imgH(id))
      var hi = 0L; var lo = 0L; var j = 0
      for (r <- 0 until 8; c <- 0 until 8) {
        val y = r * h / 8
        if (gray(id, c * w / 9, y) < gray(id, (c + 1) * w / 9, y)) {
          if (j >= 32) hi |= 1L << (j - 32) else lo |= 1L << j
        }
        j += 1
      }
      (hi, lo)
    }
    (0L until 12L).foreach { id =>
      assert((got(id).h_hi, got(id).h_lo) == refHash(id), s"id=$id")
    }
    // decode→re-encode is raster-preserving → identical signature
    val re = Multimodal.dHash(Multimodal.recodePng(imgs))
      .as[Multimodal.DHashRow].collect().map(r => r.media_id -> r).toMap
    assert((0L until 12L).forall(id =>
      (re(id).h_hi, re(id).h_lo) == (got(id).h_hi, got(id).h_lo)))
    // banded pairs == brute-force all-pairs Hamming for maxDist <= 7
    val corpus = imgs.unionByName(
      Multimodal.resizeNearest(imgs, 12, 10)
        .withColumn("media_id", col("media_id") + 100))
    val hashes = Multimodal.dHash(corpus)
    val banded = Multimodal.perceptualDupPairs(hashes, maxDist = 7)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)]
      .collect().toSet
    val all = hashes.as[Multimodal.DHashRow].collect()
    val brute = (for {
      a <- all; b <- all if a.media_id < b.media_id
      d = java.lang.Long.bitCount(a.h_hi ^ b.h_hi) +
        java.lang.Long.bitCount(a.h_lo ^ b.h_lo)
      if d <= 7
    } yield (a.media_id, b.media_id, d)).toSet
    assert(banded == brute)
  }

  test("audio fingerprint: formula reference; limiter/trim are real " +
    "codec round trips; banded pairs = brute-force Hamming") {
    val ids = spark.range(0, 10).toDF("doc_id")
    val wavs = Multimodal.synthesizeChirps(ids, "doc_id")
    def ref(id: Long, xform: Array[Int] => Array[Int]): Long = {
      val n = Multimodal.pcmN(id)
      val s = xform((0 until n).map(i => Multimodal.pcmChirp(id, i)).toArray)
      val m = s.length
      val e = (0 until 33).map(f =>
        (f * m / 33 until (f + 1) * m / 33).map(j => math.abs(s(j)).toLong).sum)
      (0 until 32).foldLeft(0L)((acc, f) =>
        if (e(f) < e(f + 1)) acc | (1L << f) else acc)
    }
    val got = Multimodal.audioFingerprint(wavs)
      .as[Multimodal.AudioFp].collect().map(r => r.media_id -> r.fp).toMap
    (0L until 10L).foreach(id => assert(got(id) == ref(id, identity)))
    // limiter clamps, trim drops leading samples — both decode the
    // edited WAV back to the expected PCM
    val lim = Multimodal.audioFingerprint(Multimodal.limitAudio(wavs, 1024))
      .as[Multimodal.AudioFp].collect().map(r => r.media_id -> r.fp).toMap
    (0L until 10L).foreach(id => assert(lim(id) ==
      ref(id, _.map(v => math.max(-1024, math.min(1024, v))))))
    val trm = Multimodal.audioFingerprint(Multimodal.trimAudio(wavs, 3))
      .as[Multimodal.AudioFp].collect().map(r => r.media_id -> r.fp).toMap
    (0L until 10L).foreach(id => assert(trm(id) == ref(id, _.drop(3))))
    // banded pairs == brute-force all-pairs Hamming for maxDist <= 7
    val corpus = wavs.unionByName(
      Multimodal.trimAudio(wavs, 3)
        .withColumn("media_id", col("media_id") + 100))
    val fps = Multimodal.audioFingerprint(corpus)
    val banded = Multimodal.fingerprintPairs(fps, maxDist = 7)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)]
      .collect().toSet
    val all = fps.as[Multimodal.AudioFp].collect()
    val brute = (for {
      a <- all; b <- all if a.media_id < b.media_id
      d = java.lang.Long.bitCount(a.fp ^ b.fp)
      if d <= 7
    } yield (a.media_id, b.media_id, d)).toSet
    assert(banded == brute)
  }

  test("video frame hashes: formula reference through the GIF codec; " +
    "shared-frame pairs = brute force") {
    val ids = spark.range(0, 12).toDF("doc_id")
    val gifs = Multimodal.synthesizeGifs(ids, "doc_id", nFrames = 4,
      varyMod = 3)
    val got = Multimodal.gifFrameHashes(gifs)
      .as[Multimodal.GifFrameHash].collect()
      .map(r => (r.media_id, r.frame_idx) -> (r.h_hi, r.h_lo)).toMap
    def ref(id: Long, f: Int): (Long, Long) = {
      val (w, h) = (Multimodal.gifW(id), Multimodal.gifH(id))
      var hi = 0L; var lo = 0L; var j = 0
      for (r <- 0 until 8; c <- 0 until 8) {
        val y = r * h / 8
        val ga = Multimodal.gifV(id, f, c * w / 9, y)
        val gb = Multimodal.gifV(id, f, (c + 1) * w / 9, y)
        if (ga < gb) { if (j >= 32) hi |= 1L << (j - 32) else lo |= 1L << j }
        j += 1
      }
      (hi, lo)
    }
    for (id <- 0L until 12L; f <- 0 until 4 + (id % 3).toInt)
      assert(got((id, f)) == ref(id, f), s"id=$id f=$f")
    // pair join == brute-force distinct-signature intersection count
    val fh = Multimodal.gifFrameHashes(gifs)
    val gotPairs = Multimodal.videoDupPairs(fh, minShared = 2)
      .as[(Long, Long, Long)].collect().toSet
    val sigs = (0L until 12L).map { id =>
      id -> (0 until 4 + (id % 3).toInt).map(f => ref(id, f)).toSet
    }.toMap
    val brute = (for {
      a <- 0L until 12L; b <- (a + 1) until 12L
      n = sigs(a).intersect(sigs(b)).size
      if n >= 2
    } yield (a, b, n.toLong)).toSet
    assert(gotPairs == brute)
  }

  test("TaskLabels.normalize: dtype-driven task typing + lexicographic " +
    "string codes (reference :61-81)") {
    import graft.serve.TaskLabels
    val tasks = Seq(
      (1L, "readmit", 3L, true, 0.7),
      (2L, "discharge", 1L, false, 0.1),
      (3L, "admit", 3L, true, 0.5))
      .toDF("subject_id", "outcome", "severity", "flag", "risk")
    val norm = TaskLabels.normalize(tasks)
    assert(norm.taskTypes == Map(
      "outcome" -> "multi_class_classification",
      "severity" -> "multi_class_classification",
      "flag" -> "binary_classification",
      "risk" -> "regression"))
    val rows = norm.df
      .select("subject_id", "outcome", "severity", "flag", "risk")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // lexicographic codes: admit→0, discharge→1, readmit→2
    assert(rows(1L) == ((1L, 2L, 3L, 1.0, 0.7)))
    assert(rows(2L) == ((2L, 1L, 1L, 0.0, 0.1)))
    assert(rows(3L) == ((3L, 0L, 3L, 1.0, 0.5)))
    val vocab = norm.vocabs("outcome").select("label", "code")
      .as[(String, Long)].collect().toMap
    assert(vocab == Map("admit" -> 0L, "discharge" -> 1L,
      "readmit" -> 2L))
  }

  test("withStaticIndices: unified-offset static vocab lookup per subject " +
    "(reference :411-442)") {
    import graft.core.Vocabulary
    val subjects = Seq((1L, "F", "US"), (2L, "M", null), (3L, "X", "DE"))
      .toDF("subject_id", "sex", "country")
    val sexVocab = Vocabulary.fit(
      Seq("F", "F", "M").toDF("sex"), "sex") // F→1, M→2
    val countryVocab = Vocabulary.fit(
      Seq("US", "US", "DE").toDF("country"), "country") // US→1, DE→2
    val offsets = BatchBuilder.buildOffsets(Seq(
      ("event_type", 3L), ("sex", 3L), ("country", 3L)))
    val bySex = offsets.find(_.measurement == "sex").get
    val byCountry = offsets.find(_.measurement == "country").get
    val seqs = Seq((1L, 5), (2L, 7), (3L, 2)).toDF("subject_id", "seq_len")
    val out = BatchBuilder.withStaticIndices(seqs, subjects,
      Seq(("sex", sexVocab, bySex), ("country", countryVocab, byCountry)))
      .select("subject_id", "static_indices",
        "static_measurement_indices")
      .as[(Long, Seq[Long], Seq[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // offsets: event_type pinned 1..3; remaining measurements in name
    // order → country offset 4, sex offset 7
    assert(byCountry.offset == 4L && bySex.offset == 7L)
    assert(out(1L) == ((Seq(7L + 1L, 4L + 1L),
      Seq(bySex.measurementIdx.toLong, byCountry.measurementIdx.toLong))))
    // null / unknown values fold to UNK(0) + offset, reference .get(val, 0)
    assert(out(2L)._1 == Seq(7L + 2L, 4L + 0L))
    assert(out(3L)._1 == Seq(7L + 0L, 4L + 2L))
  }

  test("withWavMetadata: canonical RIFF header fields match the PCM " +
    "formula without decoding; corrupt payload flags, never throws") {
    val ids = Seq(Tuple1(3L), Tuple1(21L)).toDF("doc_id")
    val media = Multimodal.synthesizeAudio(ids, "doc_id")
      .select(col("media_id"), col("payload"))
      .unionByName(Seq((99L, "garbage".getBytes("UTF-8")))
        .toDF("media_id", "payload"))
    val got = Multimodal.withWavMetadata(media, "payload")
      .select("media_id", "wav_valid", "wav_channels", "wav_sample_rate",
        "wav_bits", "wav_data_bytes", "wav_duration_ms")
      .as[(Long, Boolean, Option[Long], Option[Long], Option[Long],
        Option[Long], Option[Long])].collect().map(r => r._1 -> r).toMap
    for (id <- Seq(3L, 21L)) {
      val n = Multimodal.pcmN(id)
      val r = got(id)
      assert(r._2 && r._3 == Some(1L) && r._4 == Some(8000L) &&
        r._5 == Some(16L) && r._6 == Some(n * 2L), s"id=$id: $r")
      assert(r._7 == Some((n * 2L * 1000L) / 16000L))
    }
    assert(got(99L) == ((99L, false, None, None, None, None, None)))
  }

  test("decimateAudio: every factor-th sample survives the codec round " +
    "trip sample-exact; container rate divides; factor 1 is identity") {
    val ids = Seq(Tuple1(5L), Tuple1(33L)).toDF("doc_id")
    val wavs = Multimodal.synthesizeAudio(ids, "doc_id")
    val got = Multimodal.decodeAudioFeatures(
        Multimodal.decimateAudio(wavs, 3))
      .select("media_id", "n_samples", "sample_rate", "rms")
      .as[(Long, Int, Int, Double)].collect().map(r => r._1 -> r).toMap
    for (id <- Seq(5L, 33L)) {
      val n = Multimodal.pcmN(id)
      val m = (n + 2) / 3
      val kept = (0 until m).map(i => Multimodal.pcmSample(id, 3 * i))
      val rms = math.sqrt(
        kept.map(s => s.toLong * s).sum.toDouble / m)
      val r = got(id)
      assert(r._2 == m && r._3 == 8000 / 3, s"id=$id: $r")
      assert(math.abs(r._4 - rms) < 1e-9, s"id=$id rms")
    }
    // factor 1: byte-identical features to the source
    val src = Multimodal.decodeAudioFeatures(wavs)
      .select("media_id", "n_samples", "sample_rate", "rms")
      .as[(Long, Int, Int, Double)].collect().sortBy(_._1).toSeq
    val idn = Multimodal.decodeAudioFeatures(
        Multimodal.decimateAudio(wavs, 1))
      .select("media_id", "n_samples", "sample_rate", "rms")
      .as[(Long, Int, Int, Double)].collect().sortBy(_._1).toSeq
    assert(src == idn)
  }

  test("gifFrameDeltas: scene-structured GIFs give exact formula sums; " +
    "cuts land only at scene boundaries, through the real codec") {
    val ids = Seq(Tuple1(2L), Tuple1(7L)).toDF("doc_id")
    val got = Multimodal.gifFrameDeltas(
        Multimodal.synthesizeSceneGifs(ids, "doc_id"))
      .select("media_id", "frame_idx", "n_pixels", "sum_abs_gray_diff")
      .as[(Long, Int, Int, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got.size == 2 * 8) // 9 frames → 8 consecutive pairs per video
    for (id <- Seq(2L, 7L); f <- 1 until 9) {
      val (w, h) = (Multimodal.gifW(id), Multimodal.gifH(id))
      var s = 0L
      for (y <- 0 until h; x <- 0 until w)
        s += math.abs(Multimodal.gifSceneV(id, 3, f, x, y) -
          Multimodal.gifSceneV(id, 3, f - 1, x, y))
      assert(got((id, f)) == ((w * h, s)), s"id=$id f=$f")
      // cut rule (mean |Δ| > 8) fires exactly at scene starts (f = 3, 6)
      assert((s > w.toLong * h * 8) == (f % 3 == 0), s"cut at id=$id f=$f")
    }
  }
}
