package graft

import org.apache.spark.sql.functions._

import graft.multimodal.BinaryOps

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .withColumn("payload", col("text").cast("binary"))

  test("m1: byte length and frame count are consistent") {
    val meta = BinaryOps.withMeta(docs, "payload")
    assert(meta.where(col("n_bytes") =!= length(col("text"))).count() === 0)
    assert(meta.where(col("n_frames") =!=
      ceil(col("n_bytes").cast("double") / BinaryOps.FrameBytes).cast("long")).count() === 0)
  }

  test("m2: sampled frames tile the payload at the stride") {
    val frames = BinaryOps.sampleFrames(docs, "payload", "doc_id", stride = 4)
    assert(frames.where(col("frame_idx") % 4 =!= 0).count() === 0)
    assert(frames.where(col("frame_len") > BinaryOps.FrameBytes).count() === 0)
    assert(frames.where(col("frame_len") <= 0).count() === 0)
  }

  test("m3: quantization stays in [0,255] and dequantization error is bounded by one step") {
    import graft.queries.MultimodalQueries
    val rows = MultimodalQueries.queries("m3_quantize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_dims")
      val qSum = r.getAs[Long]("q_sum")
      assert(n > 0)
      assert(qSum >= 0 && qSum <= 255L * n)
      // scale = (vmax-vmin)/255; a floor-quantized value reconstructs
      // within one scale step by construction — spot-check the range
      assert(r.getAs[Double]("vmin") <= r.getAs[Double]("vmax"))
    }
  }

  test("m4: binary simhash puts byte-level near-dups within small hamming distance") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = ("x" * 400).getBytes("UTF-8")
    val tweaked = base.clone(); tweaked(200) = 'y'.toByte
    val distinct = ("completely different payload " * 20).getBytes("UTF-8")
    val df = Seq((1L, base), (2L, tweaked), (3L, distinct)).toDF("doc_id", "payload")
    val fp = BinaryOps.simhashBinary(df, "payload", "doc_id")
      .as[(Long, String)].collect().toMap
    def hamming(a: String, b: String): Int =
      java.lang.Long.bitCount(java.lang.Long.parseUnsignedLong(a, 16) ^
        java.lang.Long.parseUnsignedLong(b, 16))
    assert(hamming(fp(1L), fp(2L)) <= 12, s"near-dup hamming ${hamming(fp(1L), fp(2L))}")
    assert(hamming(fp(1L), fp(3L)) > 12, s"distinct hamming ${hamming(fp(1L), fp(3L))}")
  }

  test("m4: the fused byte-gram kernel is token-exact vs the hex+substr composition") {
    // SimHashBytes must reproduce the original m4 derivation bit for
    // bit — transform(sequence(1, greatest(1, length(hex(bin)) - 7),
    // 2), i -> hex(bin).substr(i, 8)) |> simhash64 — including the
    // short-payload single-token edge (len < 4 bytes: ONE token, the
    // whole hex string; empty payload: md5("")). Covers every length
    // 0..10 plus corpus-shaped rows and all byte values.
    val rnd = new scala.util.Random(42)
    val rows: Seq[(Long, Array[Byte])] =
      (0 to 10).map(n => (n.toLong, Array.tabulate[Byte](n)(i => ((i * 37 + n) % 256).toByte))) ++
        Seq((100L, Array.tabulate[Byte](256)(_.toByte)),
          (101L, Array.fill[Byte](1000)(rnd.nextInt(256).toByte)),
          (102L, ("mixed text payload " * 40).getBytes("UTF-8")))
    val df = rows.toDF("doc_id", "payload")
    val legacy = df
      .select(col("doc_id"), hex(col("payload")).as("hx"))
      .withColumn("toks", transform(
        sequence(lit(1), greatest(lit(1), length(col("hx")) - 7), lit(2)),
        i => col("hx").substr(i, lit(8))))
      .select(col("doc_id"),
        lpad(hex(graft.functions.simhash64(col("toks"))), 16, "0").as("simhash"))
      .as[(Long, String)].collect().toMap
    val fused = BinaryOps.simhashBinary(df, "payload", "doc_id")
      .as[(Long, String)].collect().toMap
    assert(fused === legacy)
  }

  test("m5: batched embedding is invariant to batch size and partitioning") {
    val src = docs.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    val a = BinaryOps.embedBatched(src.repartition(1), batchSize = 3)
      .collect().sortBy(_.id).toSeq
    val b = BinaryOps.embedBatched(src.repartition(8), batchSize = 16)
      .collect().sortBy(_.id).toSeq
    assert(a.nonEmpty)
    assert(a === b)
    // one output row per input, 8 stub dims each
    assert(a.length === docs.count())
    assert(a.forall(_.nDims === 8))
  }

  test("m6: modality routing writes format= partitions and per-modality reads prune") {
    val out = java.nio.file.Files.createTempDirectory("graft_route").toString
    BinaryOps.routeByModality(docs, "payload", "doc_id", out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("format=")), dirs.mkString(","))
    // routed counts match the sniff, nothing lost or duplicated
    val expected = BinaryOps.withMeta(docs, "payload")
      .groupBy("format").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val routed = spark.read.parquet(out)
      .groupBy("format").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(routed === expected)
    // a single-modality read prunes at the directory level
    val one = spark.read.parquet(out).where(col("format") === "type_raw")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("format"), plan.take(2000))
    assert(one.count() === expected("type_raw"))
  }

  test("mapPartitions decoder stub: deterministic energies, schema intact") {
    val input = docs.limit(50)
      .select(col("doc_id"), lit(0).as("idx"), col("payload"))
      .as[(Long, Int, Array[Byte])]
    val out1 = BinaryOps.decodePartitions(input).collect().sortBy(_.id)
    val out2 = BinaryOps.decodePartitions(input).collect().sortBy(_.id)
    assert(out1.length === 50)
    assert(out1.map(_.energy).toSeq === out2.map(_.energy).toSeq)
    assert(out1.forall(f => f.energy >= 0 && f.energy < 100000L))
  }

  test("m7: CDC boundaries are content-local — a prepended header re-chunks only the front") {
    import graft.functions.cdcChunks
    def fps(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        cdcChunks(col("payload"), minLen = 16, maskBits = 6, maxLen = 512).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val orig = fps(docs)
    val edited = fps(docs.select(col("doc_id"),
      concat(lit("v2-header: ").cast("binary"), col("payload")).as("payload")))
    // identical input → identical chunk lists (determinism)
    assert(fps(docs) === orig)
    // the edit only disturbs chunks up to the first boundary after it:
    // for every multi-chunk doc, the edited version must retain the
    // original's chunk TAIL verbatim
    val multi = orig.filter(_._2.size >= 3)
    assert(multi.nonEmpty, "fixture too small for a locality check")
    multi.foreach { case (id, o) =>
      val e = edited(id)
      val sharedTail = o.reverse.zip(e.reverse).takeWhile { case (a, b) => a == b }.size
      assert(sharedTail >= o.size - 2,
        s"doc $id: only $sharedTail of ${o.size} tail chunks survived a front edit")
    }
    // chunk fingerprints are the dedup identity: the m7 report marks
    // every copied doc's chunks shared
    val report = SparkEntry.queries("m7_cdc_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val copies = report.filter(_._1 >= 10000000L)
    assert(copies.nonEmpty)
    copies.foreach { case (id, n, shared) =>
      assert(shared >= n - 2, s"copy $id: $shared of $n chunks shared")
    }
    // empty payload → no chunks
    val empty = Seq((1L, Array.empty[Byte])).toDF("doc_id", "payload")
    assert(fps(empty)(1L).isEmpty)
  }

  test("m8: CDC near-dup pairs link every v2 re-crawl to its original, and only those") {
    val pairs = SparkEntry.queries("m8_cdc_neardup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // every original ≥450 with enough chunks to survive a front edit
    // (≥6: at most 2 disturbed → ≥4/6 ≈ 67% shared clears the 60% cut)
    // must pair with its +10000000 copy
    import graft.functions.cdcChunks
    val eligible = docs.where(col("doc_id") >= 450)
      .select(col("doc_id"),
        size(cdcChunks(col("payload"), 8, 4, 128)).as("nc"))
      .collect().filter(_.getInt(1) >= 6).map(_.getLong(0)).toSet
    assert(eligible.size >= 10, s"fixture too small: ${eligible.size} eligible docs")
    val copyPairs = pairs.filter(p => p._2 === p._1 + 10000000L)
    assert(eligible.subsetOf(copyPairs.map(_._1).toSet),
      s"missing pairs for ${(eligible -- copyPairs.map(_._1)).take(5)}")
    // each such pair shares (almost) the whole original: a front edit
    // disturbs at most the first couple of chunks
    copyPairs.foreach { case (a, b, common, na, nb, _, _) =>
      assert(common >= math.min(na, nb) - 2, s"pair ($a,$b): $common of min($na,$nb)")
    }
    // every emitted pair is containment-valid at the declared cut
    // (cross-document pairs DO appear — the synthetic corpus plants
    // real near-dups, which d1/d4 also find at the text grain)
    pairs.foreach { case (a, b, common, na, nb, ca, cb) =>
      assert(common <= math.min(na, nb), s"($a,$b): common $common > min($na,$nb)")
      assert(100L * common >= 60L * math.min(na, nb), s"($a,$b) below the cut")
      assert(ca > 0 && ca <= 1.0 && cb > 0 && cb <= 1.0)
    }
    // deterministic across runs (value-level)
    val run1 = SparkEntry.queries("m8_cdc_neardup")(spark, sf)
      .collect().map(_.toString).toSeq
    val run2 = SparkEntry.queries("m8_cdc_neardup")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(run1 === run2)
  }

  test("lk43: chunk index gates blob ingest — near-copies rejected by containment, replay admits zero") {
    import java.nio.file.Files
    import graft.multimodal.BinaryOps
    val dataPath = Files.createTempDirectory("graft_blob_data").toString + "/lake"
    val indexPath = Files.createTempDirectory("graft_blob_idx").toString + "/index"
    // per-blob-unique APERIODIC content (md5-derived tokens): chunk
    // overlap only where planted, and CDC boundaries resynchronize
    // after an edit (periodic synthetic text can defeat that)
    def blob(i: Int): String = (0 until 30).map(j =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i-$j".getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString)
      .mkString(" ")
    val corpusA = (0 until 40).map(i => (i.toLong, blob(i))).toDF("blob_id", "t")
      .select(col("blob_id"), col("t").cast("binary").as("payload"))
    corpusA.write.parquet(dataPath)
    graft.sources.ParquetLake.snapshotManifest(spark, dataPath)
    BinaryOps.chunkIndexInit(spark, indexPath, corpusA, "payload", "blob_id",
      minLen = 16, maskBits = 4, maxLen = 256)

    val fresh = (40 until 60).map(i => (i.toLong, blob(i)))
    val nearCopies = (0 until 5).map(i => (1000L + i, "v2-header: " + blob(i)))
    val inc = (fresh ++ nearCopies).toDF("blob_id", "t")
      .select(col("blob_id"), col("t").cast("binary").as("payload"))
    val r = BinaryOps.chunkGatedIngest(spark, dataPath, indexPath, inc,
      "payload", "blob_id", maxContainment = 0.5,
      minLen = 16, maskBits = 4, maxLen = 256)
    // CDC locality: a prepended header re-chunks a constant prefix,
    // every later chunk keeps its identity → containment ≈ 1
    assert(r.admitted === 20L, r.toString)
    assert(r.rejectedContained === 5L, r.toString)
    val lakeN = graft.sources.ParquetLake.readManifested(spark, dataPath).count()
    assert(lakeN === 60L)
    // the index stays a SET: re-initializing from the full lake gives
    // the same distinct-fingerprint count
    val idxN = graft.sources.ParquetLake.readManifested(spark, indexPath).count()
    assert(idxN === graft.sources.ParquetLake.readManifested(spark, dataPath)
      .select(explode(graft.functions.cdcChunks(col("payload"), 16, 4, 256)).as("fp"))
      .distinct().count())
    // replay: landed blobs contain themselves fully
    val r2 = BinaryOps.chunkGatedIngest(spark, dataPath, indexPath, inc,
      "payload", "blob_id", maxContainment = 0.5,
      minLen = 16, maskBits = 4, maxLen = 256)
    assert(r2.admitted === 0L, r2.toString)
    assert(graft.sources.ParquetLake.readManifested(spark, dataPath).count() === lakeN)
  }

  test("BinaryOps disables ImageIO's disk-backed stream cache (perf contract, not correctness)") {
    // touching the object runs its initializer; with the default
    // useCache=true every ImageIO read/write against a byte stream
    // round-trips a TEMP FILE — 32 concurrent codec tasks serialized
    // on tmpdir syscalls (7-10x on the m-family rows at local[32],
    // r14). If someone removes the setUseCache(false), nothing else
    // in the suite fails — only the bench regresses — so pin it here.
    // (Embedders can opt OUT with -Dgraft.imageio.keepCache=true; the
    // suite runs without that property, so the default applies.)
    assume(!java.lang.Boolean.getBoolean("graft.imageio.keepCache"))
    graft.multimodal.BinaryOps.FrameBytes // force object init
    assert(!javax.imageio.ImageIO.getUseCache,
      "BinaryOps must run ImageIO.setUseCache(false) in its initializer")
  }

  test("m11: imageMeta parses real ImageIO containers exactly; malformed bytes degrade, never throw") {
    import graft.functions.ImageMetaOps
    def render(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.getRaster.setSample(x, y, 0, (x * 31 + y * 17) & 0xff)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val dims = Seq((1, 1), (7, 5), (29, 17), (640, 480))
    for (fmt <- Seq("png", "jpeg", "gif", "bmp"); (w, h) <- dims) {
      val bytes = render(w, h, fmt)
      assert(ImageMetaOps.sniff(bytes) === ((fmt, w, h)),
        s"$fmt ${w}x$h header parse")
      // robustness: EVERY truncation prefix parses without throwing
      (0 to bytes.length).foreach(k => ImageMetaOps.sniff(bytes.take(k)))
    }
    // non-image bytes → raw, null dims; codegen path agrees with eval
    import spark.implicits._
    val df = Seq(
      ("png", render(3, 2, "png")),
      ("jpeg", render(3, 2, "jpeg")),
      ("raw", "just text".getBytes("UTF-8")),
      ("raw", Array.empty[Byte])).toDF("expect", "payload")
    val got = df.select(col("expect"), graft.functions.imageMeta(col("payload")).as("m"))
      .select(col("expect"), col("m.format"), col("m.width"), col("m.height"))
      .collect()
    got.foreach { r =>
      assert(r.getString(1) === r.getString(0))
      if (r.getString(0) == "raw") assert(r.isNullAt(2) && r.isNullAt(3))
      else assert(r.getInt(2) === 3 && r.getInt(3) === 2)
    }
  }

  test("m11: the driver query reports every rendered image parsing back to its exact spec") {
    val out = SparkEntry.queries("m11_image_meta")(spark, sf).collect()
    assert(out.length === 4) // png / jpeg / gif / bmp
    out.foreach { r =>
      assert(r.getAs[Long]("n_images") > 0)
      assert(r.getAs[Long]("n_parsed_exact") === r.getAs[Long]("n_images"),
        s"${r.getAs[String]("format")}: every rendered image must round-trip")
    }
  }

  test("m14: audioMeta parses real JDK audio containers exactly; malformed bytes degrade, never throw") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import graft.functions.AudioMetaOps
    def render(rate: Int, ch: Int, frames: Int, fmt: String): Array[Byte] = {
      val af = new AudioFormat(rate.toFloat, 16, ch, true, fmt != "wav")
      val pcm = new Array[Byte](frames * ch * 2)
      (0 until pcm.length).foreach(i => pcm(i) = ((i * 131) & 0xff).toByte)
      val tpe = fmt match {
        case "wav" => AudioFileFormat.Type.WAVE
        case "aiff" => AudioFileFormat.Type.AIFF
        case "au" => AudioFileFormat.Type.AU
      }
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), af, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      try AudioSystem.write(in, tpe, bos) finally in.close()
      bos.toByteArray
    }
    val specs = Seq((8000, 1, 1), (22050, 2, 997), (44100, 1, 480), (16000, 2, 1))
    for (fmt <- Seq("wav", "aiff", "au"); (rate, ch, frames) <- specs) {
      val bytes = render(rate, ch, frames, fmt)
      assert(AudioMetaOps.sniff(bytes) === ((fmt, rate, ch, 16, frames.toLong)),
        s"$fmt rate=$rate ch=$ch frames=$frames header parse")
      // robustness: EVERY truncation prefix parses without throwing
      (0 to bytes.length).foreach(k => AudioMetaOps.sniff(bytes.take(k)))
    }
    // non-audio bytes → raw, null fields; codegen path agrees with eval
    import spark.implicits._
    val df = Seq(
      ("wav", render(8000, 1, 5, "wav")),
      ("aiff", render(44100, 2, 5, "aiff")),
      ("au", render(16000, 1, 5, "au")),
      ("raw", "just text".getBytes("UTF-8")),
      ("raw", Array.empty[Byte])).toDF("expect", "payload")
    val got = df.select(col("expect"), graft.functions.audioMeta(col("payload")).as("m"))
      .select(col("expect"), col("m.format"), col("m.sample_rate"),
        col("m.channels"), col("m.bits"), col("m.n_frames"))
      .collect()
    got.foreach { r =>
      assert(r.getString(1) === r.getString(0))
      if (r.getString(0) == "raw")
        assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
      else {
        assert(r.getInt(4) === 16)
        assert(r.getLong(5) === 5L)
      }
    }
  }

  test("m14: crafted chunk sizes near Int.MaxValue never wrap the cursor or throw") {
    import graft.functions.AudioMetaOps
    // RIFF/WAVE header whose first chunk declares size 0x7ffffff0:
    // passes the (size > Int.MaxValue) guard, and before the Long
    // cursor fix wrapped `i` negative → ArrayIndexOutOfBoundsException
    def crafted(magic: (Char, Char, Char, Char), form: (Char, Char, Char, Char), le: Boolean): Array[Byte] = {
      val b = new Array[Byte](28)
      b(0) = magic._1.toByte; b(1) = magic._2.toByte; b(2) = magic._3.toByte; b(3) = magic._4.toByte
      b(8) = form._1.toByte; b(9) = form._2.toByte; b(10) = form._3.toByte; b(11) = form._4.toByte
      b(12) = 'J'.toByte; b(13) = 'U'.toByte; b(14) = 'N'.toByte; b(15) = 'K'.toByte
      val size = 0x7ffffff0
      if (le) { b(16) = (size & 0xff).toByte; b(17) = ((size >> 8) & 0xff).toByte
        b(18) = ((size >> 16) & 0xff).toByte; b(19) = ((size >> 24) & 0xff).toByte }
      else { b(16) = ((size >> 24) & 0xff).toByte; b(17) = ((size >> 16) & 0xff).toByte
        b(18) = ((size >> 8) & 0xff).toByte; b(19) = (size & 0xff).toByte }
      b
    }
    val wav = crafted(('R', 'I', 'F', 'F'), ('W', 'A', 'V', 'E'), le = true)
    val aiff = crafted(('F', 'O', 'R', 'M'), ('A', 'I', 'F', 'F'), le = false)
    assert(AudioMetaOps.sniff(wav)._1 === "wav")   // degrades, no throw
    assert(AudioMetaOps.sniff(aiff)._1 === "aiff")
    // fuzz: random junk after valid magics never throws either
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val junk = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(junk)
      AudioMetaOps.sniff("RIFF".getBytes ++ junk)
      AudioMetaOps.sniff("FORM".getBytes ++ junk)
      AudioMetaOps.sniff(".snd".getBytes ++ junk)
    }
  }

  test("m16: png/bmp round-trip every sample; the JDK gif writer quantizes dense-gray rasters") {
    import graft.multimodal.BinaryOps
    import spark.implicits._
    val specs = (0L until 300L).map(i =>
      (i, (i % 29 + 1).toInt, (i % 17 + 1).toInt,
        Seq("png", "bmp", "gif")((i % 3).toInt))).toDS()
    val out = BinaryOps.pixelRoundtrip(specs).collect()
    assert(out.length === 300)
    val lossless = out.filter(r => r.fmt == "png" || r.fmt == "bmp")
    assert(lossless.nonEmpty && lossless.forall(r => r.decodeOk && r.exact),
      "png/bmp must reproduce every encoder sample bit-for-bit")
    // the documented reason gif is EXCLUDED from m16 (and why m13/m15
    // hash an 8x8 thumb instead of raw samples): the JDK gif writer
    // palette-quantizes dense-gray rasters
    val gif = out.filter(_.fmt == "gif")
    assert(gif.forall(_.decodeOk))
    assert(gif.exists(!_.exact), "expected the measured gif quantization")
  }

  test("m17: audio content fingerprint is container-invariant, seed-distinct, junk-safe") {
    import graft.multimodal.BinaryOps
    import spark.implicits._
    // the same seeded recording in all three containers (one little-
    // endian, two big-endian) + a second seed + junk bytes
    val specs = Seq(
      (1L, 7L, 8000, 2, 100, "wav"),
      (2L, 7L, 8000, 2, 100, "aiff"),
      (3L, 7L, 8000, 2, 100, "au"),
      (4L, 8L, 8000, 2, 100, "wav"),
      (5L, 8L, 8000, 2, 100, "aiff")).toDS()
    val fps = BinaryOps.audioFingerprint(BinaryOps.renderAudioSeeded(specs))
      .collect().map(f => f.id -> f).toMap
    assert(fps.values.forall(_.ok))
    assert(fps(1L).fp === fps(2L).fp && fps(2L).fp === fps(3L).fp,
      "same PCM must fingerprint identically across wav/aiff/au")
    assert(fps(4L).fp === fps(5L).fp)
    assert(fps(1L).fp !== fps(4L).fp, "different seeds must not collide")
    val junk = BinaryOps.audioFingerprint(
      Seq((9L, Array[Byte](1, 2, 3, 4)), (10L, "RIFFjunk".getBytes)).toDS())
      .collect()
    assert(junk.forall(f => !f.ok && f.fp.isEmpty))
  }

  test("m14: the driver query reports every rendered clip parsing back to its exact spec") {
    val out = SparkEntry.queries("m14_audio_meta")(spark, sf).collect()
    assert(out.length === 3) // wav / aiff / au
    out.foreach { r =>
      assert(r.getAs[Long]("n_audio") > 0)
      assert(r.getAs[Long]("n_parsed_exact") === r.getAs[Long]("n_audio"),
        s"${r.getAs[String]("format")}: every rendered clip must round-trip")
    }
  }

  test("m12: resize decodes real containers, emits PNG thumbs at the integer target dims; junk flags (-1,-1)") {
    import spark.implicits._
    import graft.multimodal.BinaryOps
    def render(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.getRaster.setSample(x, y, 0, (x * 7 + y) & 0xff)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val in = Seq[(Long, Array[Byte])](
      (1L, render(640, 480, "jpeg")), // downscale: 8 x 6
      (2L, render(5, 3, "png")),      // under maxDim: kept as-is
      (3L, render(100, 7, "gif")),    // extreme aspect: floor then clamp → 8 x 1
      (4L, "garbage".getBytes("UTF-8")))
    val got = BinaryOps.resizeImages(in.toDS(), maxDim = 8).collect()
      .map(r => r.id -> r).toMap
    def dims(id: Long): (Int, Int) = {
      val (f, w, h) = graft.functions.ImageMetaOps.sniff(got(id).payload)
      assert(f === "png"); (w, h)
    }
    assert((got(1L).srcW, got(1L).srcH) === ((640, 480)))
    assert(dims(1L) === ((8, 6)))
    assert(dims(2L) === ((5, 3)))
    assert(dims(3L) === ((8, 1))) // 7*8/100 = 0 → clamped to 1
    assert((got(4L).srcW, got(4L).srcH) === ((-1, -1)))
    assert(got(4L).payload.isEmpty)
  }

  test("m13: aHash is container-invariant for lossless formats, near for jpeg, distinct across rasters") {
    import spark.implicits._
    import graft.multimodal.BinaryOps
    // same (seed, w, h) in four containers: lossless must collide
    // EXACTLY; jpeg's DCT loss lands within small Hamming distance
    val specs = Seq(
      (0L, 7L, 20, 12, "png"), (1L, 7L, 20, 12, "bmp"),
      (2L, 7L, 20, 12, "gif"), (3L, 7L, 20, 12, "jpeg")).toDS()
    val hs = BinaryOps.aHash(BinaryOps.renderImagesSeeded(specs))
      .collect().map(h => h.id -> h).toMap
    assert(hs.values.forall(_.ok))
    assert(hs(0L).ahash === hs(1L).ahash)
    assert(hs(0L).ahash === hs(2L).ahash)
    def hamming(a: String, b: String): Int =
      java.lang.Long.bitCount(java.lang.Long.parseUnsignedLong(a, 16) ^
        java.lang.Long.parseUnsignedLong(b, 16))
    assert(hamming(hs(0L).ahash, hs(3L).ahash) <= 8,
      s"jpeg drifted ${hamming(hs(0L).ahash, hs(3L).ahash)} bits")
    // junk flags, never throws
    val bad = BinaryOps.aHash(Seq((9L, "nope".getBytes("UTF-8"))).toDS()).collect()
    assert(bad.head.ok === false && bad.head.ahash === "")
    // the 50 m13 fixture rasters (seed → dims from the same
    // arithmetic as the query) hash pairwise-distinct — the property
    // the oracle's seed replay rests on, data-independent by
    // construction so checking it once here pins it at every SF
    val all = (0L until 50L).map(sd =>
      (sd, sd, (sd % 29 + 1).toInt, (sd % 17 + 1).toInt, "png")).toDS()
    val hashes = BinaryOps.aHash(BinaryOps.renderImagesSeeded(all))
      .collect().map(_.ahash)
    assert(hashes.distinct.length === 50, "seed rasters must hash distinct")
  }

  test("lk43: a zero-chunk (empty/null) blob is admitted and accounted, never silently dropped") {
    import java.nio.file.Files
    import graft.multimodal.BinaryOps
    val dataPath = Files.createTempDirectory("graft_blob0_data").toString + "/lake"
    val indexPath = Files.createTempDirectory("graft_blob0_idx").toString + "/index"
    def blob(i: Int): String = (0 until 30).map(j =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"e$i-$j".getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString)
      .mkString(" ")
    val corpus = (0 until 10).map(i => (i.toLong, blob(i))).toDF("blob_id", "t")
      .select(col("blob_id"), col("t").cast("binary").as("payload"))
    corpus.write.parquet(dataPath)
    graft.sources.ParquetLake.snapshotManifest(spark, dataPath)
    BinaryOps.chunkIndexInit(spark, indexPath, corpus, "payload", "blob_id",
      minLen = 16, maskBits = 4, maxLen = 256)
    // increment: one fresh blob, one near-copy, one EMPTY, one NULL
    val inc = Seq(
      (100L, Some(blob(100))),
      (101L, Some(blob(0))), // exact copy → containment 1 → reject
      (102L, Some("")),
      (103L, Option.empty[String])).toDF("blob_id", "t")
      .select(col("blob_id"), col("t").cast("binary").as("payload"))
    val r = BinaryOps.chunkGatedIngest(spark, dataPath, indexPath, inc,
      "payload", "blob_id", maxContainment = 0.5,
      minLen = 16, maskBits = 4, maxLen = 256)
    // the chunkless blobs ADMIT (nothing to be contained by) and are
    // reported in their own bucket; accounting sums to the increment
    assert(r.admitted === 3L, r.toString)
    assert(r.rejectedContained === 1L, r.toString)
    assert(r.admittedChunkless === 2L, r.toString)
    val landed = graft.sources.ParquetLake.readManifested(spark, dataPath)
      .select("blob_id").collect().map(_.getLong(0)).toSet
    assert(landed.contains(102L) && landed.contains(103L) && landed.contains(100L))
    assert(!landed.contains(101L))
  }

  test("lk46: frame-gated ingest rejects re-encoded seen footage, admits fresh and frameless, index tracks unique stills") {
    import java.nio.file.Files
    import spark.implicits._
    val dataPath = Files.createTempDirectory("graft_fgate_data").toString + "/lake"
    val indexPath = Files.createTempDirectory("graft_fgate_idx").toString + "/index"
    def gifs(specs: Seq[(Long, Array[Long])]) =
      BinaryOps.renderAnimatedGifs(specs.map { case (id, seeds) =>
        (id, 16, 16, seeds) }.toDS()).toDF("blob_id", "payload")
    // corpus: 5 blobs x 3 frames, seeds 0..14 all distinct
    val corpus = gifs((0L until 5L).map(i => i -> Array(i * 3, i * 3 + 1, i * 3 + 2)))
    corpus.write.parquet(dataPath)
    graft.sources.ParquetLake.snapshotManifest(spark, dataPath)
    BinaryOps.frameIndexInit(spark, indexPath, corpus, "payload", "blob_id")
    assert(graft.sources.ParquetLake.readManifested(spark, indexPath).count() === 15L)
    // increment: fresh clip; a re-encoded copy of blob 0's footage
    // with one new intro frame (3/4 frames seen -> containment .75);
    // an undecodable blob (frameless bucket)
    val inc = gifs(Seq(100L -> Array(100L, 101L, 102L), 101L -> Array(999L, 0L, 1L, 2L)))
      .union(Seq((102L, "not a gif".getBytes("UTF-8"))).toDF("blob_id", "payload"))
    val r = BinaryOps.frameGatedIngest(spark, dataPath, indexPath, inc,
      "payload", "blob_id", maxContainment = 0.5)
    assert(r.admitted === 2L, r.toString)
    assert(r.rejectedContained === 1L, r.toString)
    assert(r.admittedChunkless === 1L, r.toString)
    val landed = graft.sources.ParquetLake.readManifested(spark, dataPath)
      .select("blob_id").collect().map(_.getLong(0)).toSet
    assert(landed === Set(0L, 1L, 2L, 3L, 4L, 100L, 102L))
    // index grew by exactly the admitted clip's 3 unseen stills — the
    // rejected blob's fresh intro frame (seed 999) must NOT leak in
    assert(graft.sources.ParquetLake.readManifested(spark, indexPath).count() === 18L)
    // replay: the landed clip is now fully contained -> zero framed admits
    val r2 = BinaryOps.frameGatedIngest(spark, dataPath, indexPath,
      gifs(Seq(100L -> Array(100L, 101L, 102L))), "payload", "blob_id",
      maxContainment = 0.5)
    assert(r2.admitted === 0L && r2.rejectedContained === 1L, r2.toString)
  }

  test("m15: animated GIF round-trips every frame; frame hashes are container-invariant and order-preserving") {
    import spark.implicits._
    // blob 0: 3 frames (seeds 5, 9, 2); blob 1: 2 frames sharing seed
    // 9 at a DIFFERENT frame position; blob 2: junk bytes
    val gifs = BinaryOps.renderAnimatedGifs(Seq(
      (0L, 16, 16, Array(5L, 9L, 2L)),
      (1L, 16, 16, Array(9L, 33L))).toDS())
    val fh = BinaryOps.gifFrameHashes(gifs).collect()
      .map(f => (f.id, f.frameIdx) -> f).toMap
    // every frame recovered, in order, all ok
    assert(fh.size === 5 && fh.values.forall(_.ok))
    // cross-blob repeat: blob 0 frame 1 (seed 9) == blob 1 frame 0
    assert(fh((0L, 1)).ahash === fh((1L, 0)).ahash)
    // frame-grain container invariance: a frame decoded out of the
    // animated container hashes EXACTLY like the same seed rendered
    // as a standalone single-image GIF — the property the m15 oracle's
    // seed replay rests on
    val solo = BinaryOps.aHash(BinaryOps.renderImagesSeeded(Seq(
      (100L, 5L, 16, 16, "gif"), (101L, 9L, 16, 16, "gif"),
      (102L, 2L, 16, 16, "gif"), (103L, 33L, 16, 16, "gif")).toDS()))
      .collect().map(h => h.id -> h.ahash).toMap
    assert(fh((0L, 0)).ahash === solo(100L))
    assert(fh((0L, 1)).ahash === solo(101L))
    assert(fh((0L, 2)).ahash === solo(102L))
    assert(fh((1L, 1)).ahash === solo(103L))
    // junk payload: one ok=false row, never a throw
    val bad = BinaryOps.gifFrameHashes(
      Seq((9L, "not a gif".getBytes("UTF-8"))).toDS()).collect()
    assert(bad.length === 1 && !bad.head.ok && bad.head.frameIdx === -1)
    // the 40 m15 fixture seeds hash pairwise-distinct at the query's
    // 16x16 dims — data-independent, so pinning it once here pins the
    // oracle's seed↔hash bijection at every SF
    val all = (0L until 40L).map(sd => (sd, sd, 16, 16, "gif")).toDS()
    val hashes = BinaryOps.aHash(BinaryOps.renderImagesSeeded(all))
      .collect().map(_.ahash)
    assert(hashes.distinct.length === 40, "seed rasters must hash distinct")
  }

  test("m15: the driver query's dup groups match the seed-arithmetic replay") {
    import graft.queries.MultimodalQueries
    val rows = MultimodalQueries.queries("m15_gif_frame_dedup")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // every group is a genuine repeat and group keys are unique
    assert(rows.forall(_.getAs[Long]("n_frames") > 1))
    val keys = rows.map(r =>
      (r.getAs[Long]("first_doc"), r.getAs[Long]("first_frame")))
    assert(keys.distinct.length === keys.length)
  }
}
