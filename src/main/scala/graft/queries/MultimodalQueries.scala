package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.BinaryOps

/** §2.6 — multimodal binary-column plumbing, using the documents'
  * UTF-8 bytes as the opaque payload stand-in (pure ASCII, so the
  * DuckDB oracle can mirror byte ops with text ops).
  */
object MultimodalQueries {

  /** m11/m12's shared render spec: one image per document, dims and
    * container format derived from doc_id alone — FIXED-SIZE per doc
    * by construction, so total rendered bytes scale linearly with the
    * corpus (the [[payloadBytes]] probes pin that claim).
    */
  private def imageSpecs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    table(s, dir, "documents")
      .select(col("doc_id").cast("long"),
        (pmod(col("doc_id"), lit(29)) + 1).cast("int"),
        (pmod(col("doc_id"), lit(17)) + 1).cast("int"),
        element_at(array(lit("png"), lit("jpeg"), lit("gif"), lit("bmp")),
          (pmod(col("doc_id"), lit(4)) + 1).cast("int")))
      .as[(Long, Int, Int, String)]
  }

  /** m15's animated-GIF spec: (doc_id % 3) + 2 frames of 16×16, frame
    * f's raster seeded by (id·7 + f·13) % 40 so stills repeat across
    * blobs.
    */
  private def gifSpecsM15(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    table(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"),
        lit(16).as("w"), lit(16).as("h"),
        transform(
          sequence(lit(0L), pmod(col("doc_id").cast("long"), lit(3L)) + 1L),
          f => pmod(col("doc_id").cast("long") * 7 + f * 13, lit(40L))).as("seeds"))
      .as[(Long, Int, Int, Array[Long])]
  }

  /** m18's animated-GIF spec: (doc_id % 6) + 2 frames built in
    * consecutive identical pairs (seed j = f div 2).
    */
  private def gifSpecsM18(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    table(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"),
        lit(16).as("w"), lit(16).as("h"),
        transform(
          sequence(lit(0L), pmod(col("doc_id"), lit(6)).cast("long") + 1L),
          f => pmod(col("doc_id").cast("long") * 7 + shiftright(f, 1) * 13,
            lit(40L)))
          .as("seeds"))
      .as[(Long, Int, Int, Array[Long])]
  }

  /** m16's spec: the raster-exact containers only (png/bmp — the JDK
    * GIF writer palette-quantizes dense-gray rasters).
    */
  private def rasterExactSpecs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    table(s, dir, "documents")
      .select(col("doc_id").cast("long"),
        (pmod(col("doc_id"), lit(29)) + 1).cast("int"),
        (pmod(col("doc_id"), lit(17)) + 1).cast("int"),
        element_at(array(lit("png"), lit("bmp")),
          (pmod(col("doc_id"), lit(2)) + 1).cast("int")))
      .as[(Long, Int, Int, String)]
  }

  /** m17's seeded audio spec: clips sharing a PCM seed are
    * sample-identical across different containers.
    */
  private def audioSpecsM17(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    table(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"),
        pmod(col("doc_id"), lit(40)).cast("long").as("seed"))
      .select(col("id"), col("seed"),
        ((pmod(col("seed"), lit(2)) + 1) * 8000).cast("int").as("rate"),
        (pmod(col("seed"), lit(2)) + 1).cast("int").as("ch"),
        (pmod(col("seed"), lit(199)) + 1).cast("int").as("frames"),
        element_at(array(lit("wav"), lit("aiff"), lit("au")),
          (pmod(col("id"), lit(3)) + 1).cast("int")).as("fmt"))
      .as[(Long, Long, Int, Int, Int, String)]
  }

  /** Rendered-payload byte probes for the codec-bound rows: the
    * headroom bench divides a row's 10×-data time ratio by its byte
    * ratio, separating "the blobs got bigger at sf1" from genuinely
    * superlinear per-byte work (the r13 verdict flagged m12/m15/m18
    * at 12.5–14.5× under the old 8 GiB heap). Each probe renders from
    * the SAME private spec builder its query uses, so the normalizer
    * cannot drift from the measured work.
    */
  val payloadBytes: Map[String, (org.apache.spark.sql.SparkSession, String) => Long] = Map(
    "m12_image_resize" -> ((s, dir) =>
      BinaryOps.renderImages(imageSpecs(s, dir)).toDF()
        .agg(sum(length(col("payload")))).head().getLong(0)),
    "m15_gif_frame_dedup" -> ((s, dir) =>
      BinaryOps.renderAnimatedGifs(gifSpecsM15(s, dir)).toDF("id", "payload")
        .agg(sum(length(col("payload")))).head().getLong(0)),
    "m18_scene_cuts" -> ((s, dir) =>
      BinaryOps.renderAnimatedGifs(gifSpecsM18(s, dir)).toDF("id", "payload")
        .agg(sum(length(col("payload")))).head().getLong(0)),
    "m17_audio_dedup" -> ((s, dir) =>
      BinaryOps.renderAudioSeeded(audioSpecsM17(s, dir)).toDF("id", "payload")
        .agg(sum(length(col("payload")))).head().getLong(0)),
    "m16_pixel_roundtrip" -> ((s, dir) =>
      BinaryOps.renderImages(rasterExactSpecs(s, dir)).toDF()
        .agg(sum(length(col("payload")))).head().getLong(0)))

  val queries: Map[String, Q] = Map(
    "m1_binary_meta" -> ((s, dir) =>
      BinaryOps.withMeta(
        table(s, dir, "documents").withColumn("payload", col("text").cast("binary")),
        "payload")
        .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
          col("format"), col("n_frames"))
        .orderBy("doc_id")),

    "m2_frame_sample" -> ((s, dir) =>
      BinaryOps.sampleFrames(
        table(s, dir, "documents").withColumn("payload", col("text").cast("binary")),
        "payload", "doc_id", stride = 4)
        .withColumn("frame_len", col("frame_len").cast("long"))
        .orderBy("id", "frame_idx")),

    // int8-quantization reconstruction-error QC — the check before
    // shipping m3's quantized embeddings anywhere: per vector, the
    // worst-dimension |x − decode(encode(x))| under the same
    // per-vector [min,max]/255 grid m3 writes. Narrow per-row
    // arithmetic (no shuffle until the final sort); identical IEEE
    // expression both engines
    "m10_quantize_error" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
        .withColumn("v", transform(col("embedding"), x => x.cast("double")))
        .withColumn("vmin", array_min(col("v")))
        .withColumn("vmax", array_max(col("v")))
      e.withColumn("err", expr(
          """array_max(transform(v, x ->
            |  abs(x - (CASE WHEN vmax = vmin THEN x
            |    ELSE vmin + least(floor((x - vmin) * 255.0D / (vmax - vmin)), 255.0D)
            |      * (vmax - vmin) / 255.0D END))))""".stripMargin))
        .select(
          col("vec_id"),
          round((col("vmax") - col("vmin")) / 255.0, 6).as("step"),
          round(col("err"), 6).as("max_abs_err"))
        .orderBy("vec_id")
    }),

    // frame-grain exact dedup: repeated fixed-size frames across the
    // whole binary corpus (m2's frames × d1's fingerprint groupBy) —
    // the storage/compute saving scan before re-encoding a video
    // corpus; only frame hashes shuffle, never bytes
    "m9_frame_dedup" -> ((s, dir) =>
      BinaryOps.sampleFrames(
        table(s, dir, "documents").withColumn("payload", col("text").cast("binary")),
        "payload", "doc_id", stride = 1)
        .groupBy("frame_feature")
        .agg(count(lit(1)).as("n_occ"),
          count_distinct(col("id")).as("n_docs"),
          min(col("id")).as("first_doc"))
        .where(col("n_occ") > 1)
        .orderBy("frame_feature")),

    // binary near-dup fingerprints: SimHash over byte-4-grams of the
    // payload (engine-specific hash → rows-only + MultimodalSpec m4)
    "m4_binary_simhash" -> ((s, dir) =>
      BinaryOps.simhashBinary(
        table(s, dir, "documents").withColumn("payload", col("text").cast("binary")),
        "payload", "doc_id")
        .orderBy("id")),

    // batched "model inference" plumbing: one row per payload from
    // the per-partition fixed-batch mapPartitions encoder (model
    // stubbed deterministically — md5 chunks as logits — so the whole
    // batch path is oracle-replayable; norm is computed in fixed
    // array order, bit-identical across engines)
    "m5_embed_batched" -> ((s, dir) => {
      import s.implicits._
      val src = table(s, dir, "documents")
        // one parquet file arrives as ONE partition; spread the
        // compute-heavy per-row encode across cores (input splits do
        // this on a real cluster)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("text").cast("binary"))
        .as[(Long, Array[Byte])]
      BinaryOps.embedBatched(src)
        .toDF()
        .select(col("id").as("doc_id"), col("nDims").cast("long").as("n_dims"),
          col("intSum").as("int_sum"), col("eMd5").as("e_md5"),
          round(col("norm"), 4).as("norm"))
        .orderBy("doc_id")
    }),

    // int8 range quantization of embedding vectors (the storage
    // compression step of a vector pipeline): per-vector min/max
    // scale, floor-quantize to 0..255. floor (not round) keeps the
    // double arithmetic bit-identical across engines.
    "m3_quantize" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
        .withColumn("v", transform(col("embedding"), x => x.cast("double")))
        .withColumn("vmin", array_min(col("v")))
        .withColumn("vmax", array_max(col("v")))
      e.withColumn("q",
          transform(col("v"), x =>
            when(col("vmax") === col("vmin"), lit(0L))
              .otherwise(least(
                floor((x - col("vmin")) * 255.0 / (col("vmax") - col("vmin"))),
                lit(255L)))))
        .select(
          col("vec_id"),
          size(col("q")).cast("long").as("n_dims"),
          round(col("vmin"), 4).as("vmin"),
          round(col("vmax"), 4).as("vmax"),
          aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("q_sum"),
          md5(concat_ws(",", transform(col("q"), _.cast("string")))).as("q_md5"))
        .orderBy("vec_id")
    }),

    // chunk-grain binary dedup via content-defined chunking: a
    // duplicated tail slice of the corpus makes every original's
    // chunks shared — fingerprints only cross the shuffle, bytes
    // never do. Oracle: full byte-for-byte recursive-CTE replay of
    // the gear/FNV walk ([[cdcChunksSql]]); QC-sampled at the 100x
    // replay like the quadratic family (the walk is linear but the
    // DuckDB recursion pays per byte)
    "m7_cdc_dedup" -> ((s, dir) => {
      val docs = qcSampledByText(table(s, dir, "documents"))
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      // re-ingested near-copies: the last 50 docs appear again under
      // new ids with a small header prepended (the CDC selling point:
      // document-grain exact dedup sees distinct payloads)
      val copies = docs.where(col("doc_id") >= 450)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          concat(lit("v2-header: ").cast("binary"), col("payload")).as("payload"))
      BinaryOps.cdcDedupReport(
          docs.unionAll(copies), "payload", "doc_id",
          minLen = 16, maskBits = 6, maxLen = 512)
        .orderBy("id")
    }),

    // blob near-dup pairs over m7's fixture: each v2 near-copy must
    // pair with its original at high containment (oracle: same
    // recursive-CTE gear/FNV replay as m7 at this row's finer grain,
    // plus the pair logic in plain SQL)
    "m8_cdc_neardup" -> ((s, dir) => {
      val docs = qcSampledByText(table(s, dir, "documents"))
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val copies = docs.where(col("doc_id") >= 450)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          concat(lit("v2-header: ").cast("binary"), col("payload")).as("payload"))
      // finer grain than m7 (≈32-byte chunks): the fixture docs are a
      // few hundred bytes, and pairing needs several chunks per doc
      BinaryOps.cdcNearDupPairs(
          docs.unionAll(copies), "payload", "doc_id", pct = 60,
          minLen = 8, maskBits = 4, maxLen = 128)
        .orderBy("id_a", "id_b")
    }),

    // REAL image containers end-to-end: render one PNG/JPEG/GIF/BMP
    // per document via the JDK's ImageIO (no stub — genuine encoder
    // bytes), then sniff format + dimensions back out of the headers
    // with the native ImageMeta expression. The oracle pins the
    // strong claim: EVERY rendered image must round-trip its spec
    // exactly (n_parsed_exact == n_images per format), which only
    // holds if both the encoder plumbing and the header parser are
    // right. Per-row work is header-bounded; only (format, dims)
    // aggregate — bytes never shuffle
    "m11_image_meta" -> ((s, dir) => {
      BinaryOps.renderImages(imageSpecs(s, dir)).toDF()
        .withColumn("meta", graft.functions.imageMeta(col("payload")))
        .groupBy(col("fmt").as("format"))
        .agg(count(lit(1)).as("n_images"),
          sum(when(col("meta.format") === col("fmt") &&
              col("meta.width") === col("w") &&
              col("meta.height") === col("h"), 1L).otherwise(0L))
            .as("n_parsed_exact"),
          sum(col("meta.width").cast("long")).as("sum_width"),
          sum(col("meta.height").cast("long")).as("sum_height"))
        .orderBy("format")
    }),

    // REAL decode → resize → re-encode (thumbnail normalization):
    // ImageIO decodes the m11-rendered container, a bilinear scale
    // maps it to max-dim 8 with integer target arithmetic, the PNG
    // re-encode goes back through the header sniffer — so the emitted
    // thumb dims come from actual output bytes, while the oracle
    // recomputes them from the spec arithmetic alone. Whole path
    // bytes-local (one mapPartitions chain, no shuffle before the
    // final sort)
    "m12_image_resize" -> ((s, dir) => {
      import s.implicits._
      val rendered = BinaryOps.renderImages(imageSpecs(s, dir))
        .map(r => (r.id, r.payload))
      BinaryOps.resizeImages(rendered, maxDim = 8).toDF()
        .withColumn("meta", graft.functions.imageMeta(col("payload")))
        .select(col("id").as("doc_id"),
          col("srcW").cast("long").as("src_w"),
          col("srcH").cast("long").as("src_h"),
          col("meta.width").cast("long").as("thumb_w"),
          col("meta.height").cast("long").as("thumb_h"))
        .orderBy("doc_id")
    }),

    // REAL perceptual image dedup: docs sharing a raster seed are
    // pixel-identical images shipped in DIFFERENT lossless containers
    // (png vs bmp by id parity — byte-grain dedup sees distinct
    // blobs), so their decoded aHash collides exactly and the cluster
    // report groups them; the oracle replays the seed arithmetic, so
    // matching requires the decode→thumb→hash path to be both correct
    // and container-invariant. Different seeds hash distinct (the 50
    // possible rasters are data-independent; spec-pinned). Only the
    // 16-char hash shuffles, never pixels
    "m13_image_ahash_dedup" -> ((s, dir) => {
      import s.implicits._
      val specs = table(s, dir, "documents")
        .select(col("doc_id").cast("long").as("id"),
          pmod(col("doc_id"), lit(50)).cast("long").as("seed"))
        .select(col("id"), col("seed"),
          (pmod(col("seed"), lit(29)) + 1).cast("int").as("w"),
          (pmod(col("seed"), lit(17)) + 1).cast("int").as("h"),
          element_at(array(lit("png"), lit("bmp")),
            (pmod(col("id"), lit(2)) + 1).cast("int")).as("fmt"))
        .as[(Long, Long, Int, Int, String)]
      BinaryOps.aHash(BinaryOps.renderImagesSeeded(specs)).toDF()
        .groupBy("ahash")
        .agg(min(col("id")).as("first_doc"), count(lit(1)).as("n_docs"))
        .where(col("n_docs") > 1)
        .select(col("first_doc"), col("n_docs"))
        .orderBy("first_doc")
    }),

    // m11's AUDIO twin: render genuine WAV/AIFF/AU containers via the
    // JDK's sound stack (javax.sound.sampled — no stub), then sniff
    // sample rate / channels / bit depth / frame count back out of
    // the header bytes alone with the native AudioMeta expression
    // (RIFF chunk walk, AIFF 80-bit extended-float rate, AU word
    // header — samples never read). Oracle pins the round-trip: every
    // rendered clip must parse back to exactly its spec, incl. the
    // 16-bit depth every JDK writer emits. Header-bounded per-row
    // work; only typed metadata aggregates — bytes never shuffle
    "m14_audio_meta" -> ((s, dir) => {
      import s.implicits._
      val specs = table(s, dir, "documents")
        .select(col("doc_id").cast("long"),
          element_at(
            array(lit(8000), lit(16000), lit(22050), lit(44100)),
            (pmod(col("doc_id"), lit(4)) + 1).cast("int")),
          (pmod(col("doc_id"), lit(2)) + 1).cast("int"),
          (pmod(col("doc_id"), lit(997)) + 1).cast("int"),
          element_at(array(lit("aiff"), lit("au"), lit("wav")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")))
        .as[(Long, Int, Int, Int, String)]
      BinaryOps.renderAudio(specs).toDF()
        .withColumn("meta", graft.functions.audioMeta(col("payload")))
        .groupBy(col("fmt").as("format"))
        .agg(count(lit(1)).as("n_audio"),
          sum(when(col("meta.format") === col("fmt") &&
              col("meta.sample_rate") === col("sampleRate") &&
              col("meta.channels") === col("channels") &&
              col("meta.bits") === 16 &&
              col("meta.n_frames") === col("nFrames"), 1L).otherwise(0L))
            .as("n_parsed_exact"),
          sum(col("meta.n_frames")).as("sum_frames"),
          sum(col("meta.sample_rate").cast("long")).as("sum_rate"))
        .orderBy("format")
    }),

    // REAL frame-grain dedup over a multi-frame container (m15): each
    // doc renders as a genuine ANIMATED GIF (ImageIO sequence writer,
    // (doc_id % 3) + 2 frames, frame f's raster seeded by
    // (id*7 + f*13) % 40 so stills repeat across blobs), the frames
    // are decoded BACK out of the container and perceptually hashed
    // (BinaryOps.gifFrameHashes — the de-stubbed m2 shape), and
    // repeated frames across the corpus group by hash. The oracle
    // replays the seed arithmetic only, so matching requires the
    // encode → multi-frame decode → per-frame hash path to be exact
    // and frame-order-preserving. Only (id, frameIdx, hash) rows
    // leave the scan — frame bytes never shuffle; min(id*10+f) is a
    // unique lexicographic group key (frames per blob < 10)
    "m15_gif_frame_dedup" -> ((s, dir) => {
      BinaryOps.gifFrameHashes(
        BinaryOps.renderAnimatedGifs(gifSpecsM15(s, dir))).toDF()
        .groupBy("ahash")
        .agg(min(col("id") * 10 + col("frameIdx")).as("fk"),
          count(lit(1)).as("n_frames"),
          countDistinct(col("id")).as("n_blobs"))
        .where(col("n_frames") > 1)
        .select(expr("fk DIV 10").as("first_doc"),
          pmod(col("fk"), lit(10)).as("first_frame"),
          col("n_frames"), col("n_blobs"))
        .orderBy("first_doc", "first_frame")
    }),

    // FULL-RESOLUTION pixel round-trip audit: m11 pins headers, m13
    // pins an 8×8 thumb hash — this pins every sample of every
    // RASTER-EXACT container bit-for-bit against the construction
    // raster (render → decode → compare, all partition-local; only
    // typed flags aggregate). png/bmp only: the JDK's GIF writer
    // palette-QUANTIZES dense-gray rasters (measured: ~18% of the
    // m11-spec'd images come back off-by-a-level), which is exactly
    // why m15's frame dedup hashes an 8×8 thumb instead of raw
    // samples. The oracle predicts n_pixel_exact == n_images and the
    // pixel totals from the spec arithmetic alone — green only if
    // the encoder AND decoder are sample-exact.
    "m16_pixel_roundtrip" -> ((s, dir) => {
      BinaryOps.pixelRoundtrip(rasterExactSpecs(s, dir)).toDF()
        .groupBy(col("fmt").as("format"))
        .agg(count(lit(1)).as("n_images"),
          sum(when(col("decodeOk") && col("exact"), 1L).otherwise(0L))
            .as("n_pixel_exact"),
          sum(col("nPix")).as("n_pixels"))
        .orderBy("format")
    }),

    // m13's AUDIO twin: docs sharing a PCM seed are sample-identical
    // recordings shipped in DIFFERENT containers (wav/aiff/au by id
    // mod 3 — byte-grain dedup sees distinct blobs; wav is even
    // little-endian where the others are big-endian), so their
    // canonical-PCM fingerprints collide exactly and the cluster
    // report groups them. The oracle replays only the seed
    // arithmetic, so matching requires encode → container decode →
    // canonical re-serialization to be sample-exact and
    // container-invariant. Only 32-char fingerprints shuffle.
    "m17_audio_dedup" -> ((s, dir) => {
      BinaryOps.audioFingerprint(
        BinaryOps.renderAudioSeeded(audioSpecsM17(s, dir))).toDF()
        .groupBy("fp")
        .agg(min(col("id")).as("first_doc"), count(lit(1)).as("n_docs"))
        .where(col("n_docs") > 1)
        .select(col("first_doc"), col("n_docs"))
        .orderBy("first_doc")
    }),

    // scene-cut detection / keyframe selection on REAL animated GIFs:
    // frames are built in CONSECUTIVE IDENTICAL PAIRS (seed j = i div
    // 2 over m15's 40-seed fixture space, adjacent j's 13 apart mod
    // 40 so distinct scenes hash distinct), and a cut is any frame
    // whose decoded perceptual hash differs from its predecessor —
    // the shot-boundary pass that picks which frames a vision model
    // actually sees. The oracle predicts every doc's cut count from
    // the pair arithmetic alone, so matching requires decode order,
    // completeness, and hash stability all at once. Per-doc windows
    // run over ≤7 frames of 16-char hashes — bytes never shuffle.
    "m18_scene_cuts" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy("frameIdx")
      BinaryOps.gifFrameHashes(
        BinaryOps.renderAnimatedGifs(gifSpecsM18(s, dir))).toDF()
        .withColumn("prev", lag("ahash", 1).over(w))
        .groupBy("id")
        .agg(count(lit(1)).as("n_frames"),
          sum(when(col("prev").isNotNull && col("prev") =!= col("ahash"), 1L)
            .otherwise(0L)).as("n_cuts"))
        .orderBy("id")
    }))

  /** DuckDB replay of [[graft.functions.CdcOps.chunks]] over the m7/m8
    * fixture (documents ∪ "v2-header: "-prefixed near-copies of
    * doc_id ≥ 450): a recursive CTE walks every payload byte-for-byte
    * — gear rolling hash with 64-bit wraparound in HUGEINT residues,
    * the boundary rule ((len ≥ minLen ∧ low-maskBits-zero) ∨ len ≥
    * maxLen), and running FNV-1a chunk identities — emitting one
    * (id, fp) row per chunk, exactly the explode(cdcChunks(...))
    * relation. Only the kernel's constant gear TABLE is shared
    * (CdcOps.gearSqlValues — the algorithm's spec constants, like an
    * S-box); the walk itself (shift/add/mask/reset, FNV xor-mult,
    * trailing-chunk rule) is re-derived in SQL. Byte access is
    * ascii(substr(text, i, 1)): the driver corpus is pure ASCII at
    * every SF (verified sf0.01/sf1), where chars ≡ UTF-8 bytes.
    */
  private def cdcChunksSql(minLen: Int, maskBits: Int, maxLen: Int): String = {
    val m64 = "18446744073709551616" // 2^64
    val fnvInit = "14695981039346656037" // 0xcbf29ce484222325
    s"""WITH RECURSIVE gear(gb, gv) AS (
       |  SELECT gb, gv::HUGEINT FROM (VALUES ${graft.functions.CdcOps.gearSqlValues}) g(gb, gv)
       |), payloads AS MATERIALIZED (
       |  -- MATERIALIZED is load-bearing: the recursive term joins this
       |  -- CTE every iteration, and inlined it would recompute the
       |  -- QC-sample predicate (md5 over normalized text, all docs)
       |  -- per byte-step — measured ~60x on the sampled sf1 replay
       |  SELECT doc_id AS id, text AS s, octet_length(encode(text)) AS n FROM documents
       |  UNION ALL
       |  SELECT doc_id + 10000000, 'v2-header: ' || text, octet_length(encode(text)) + 11
       |  FROM documents WHERE doc_id >= 450
       |), walk(id, pos, h, fp, cs, emit) AS (
       |  SELECT id, 0, 0::HUGEINT, $fnvInit::HUGEINT, 1, NULL::HUGEINT
       |  FROM payloads WHERE n > 0
       |  UNION ALL
       |  SELECT id, pos, h2, fp2, cs2, emit FROM (
       |    SELECT w.id, w.pos + 1 AS pos,
       |      CASE WHEN bnd THEN 0::HUGEINT ELSE h2 END AS h2,
       |      CASE WHEN bnd THEN $fnvInit::HUGEINT ELSE fp2 END AS fp2,
       |      CASE WHEN bnd THEN w.pos + 2 ELSE w.cs END AS cs2,
       |      CASE WHEN bnd THEN fp2 ELSE NULL END AS emit
       |    FROM (
       |      SELECT w.id, w.pos, w.cs,
       |        (w.h * 2 + g.gv) % $m64 AS h2,
       |        (((w.fp - w.fp % 256) + xor((w.fp % 256)::BIGINT, ascii(substr(p.s, w.pos + 1, 1)))::HUGEINT)
       |          * 1099511628211) % $m64 AS fp2,
       |        ((w.pos + 2 - w.cs >= $minLen AND
       |          ((w.h * 2 + g.gv) % $m64) % ${1L << maskBits} = 0)
       |         OR w.pos + 2 - w.cs >= $maxLen) AS bnd
       |      FROM walk w
       |      JOIN payloads p USING (id)
       |      JOIN gear g ON g.gb = ascii(substr(p.s, w.pos + 1, 1))
       |      WHERE w.pos < p.n
       |    ) w
       |  )
       |), chunks AS (
       |  SELECT id, emit AS fp FROM walk WHERE emit IS NOT NULL
       |  UNION ALL
       |  SELECT w.id, w.fp FROM walk w JOIN payloads p USING (id)
       |  WHERE w.pos = p.n AND w.emit IS NULL AND w.cs <= p.n
       |)""".stripMargin
  }

  /** The CDC rows' oracles are exact but pay DuckDB recursion per
    * byte; at the 100x replay they join the QC-sampled family (same
    * content-keyed doc sample both engines — copies are built FROM the
    * sampled docs, so orig/copy pairs survive at rate ~p).
    */
  private val qcCdcRows = Set("m7_cdc_dedup", "m8_cdc_neardup")

  private val oracleSqlRaw: Map[String, String] = Map(
    // full byte-for-byte chunker replay (see cdcChunksSql), then the
    // same multiplicity aggregation as BinaryOps.cdcDedupReport
    "m7_cdc_dedup" ->
      s"""${cdcChunksSql(minLen = 16, maskBits = 6, maxLen = 512)},
         |mult AS (SELECT fp, count(*) AS n_occ FROM chunks GROUP BY 1)
         |SELECT id, count(*)::BIGINT AS n_chunks,
         |  sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END)::BIGINT AS shared_chunks
         |FROM chunks JOIN mult USING (fp) GROUP BY id ORDER BY id""".stripMargin,
    // same replay at m8's finer grain + the pair containment logic of
    // BinaryOps.cdcNearDupPairs (distinct fps, occurrence cap 64,
    // inverted-index self-join, >= 60% of the smaller side)
    "m8_cdc_neardup" ->
      s"""${cdcChunksSql(minLen = 8, maskBits = 4, maxLen = 128)},
         |sets AS (SELECT DISTINCT id, fp FROM chunks),
         |sizes AS (SELECT id, count(*) AS n_ch FROM sets GROUP BY 1),
         |rare AS (
         |  SELECT s.id, s.fp FROM sets s JOIN (
         |    SELECT fp, count(*) AS n_occ FROM sets GROUP BY 1 HAVING count(*) <= 64) o USING (fp)
         |), common AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
         |  FROM rare a JOIN rare b USING (fp) WHERE a.id < b.id GROUP BY 1, 2
         |)
         |SELECT id_a, id_b, n_common::BIGINT AS n_common,
         |  sa.n_ch::BIGINT AS n_a, sb.n_ch::BIGINT AS n_b,
         |  round(n_common::DOUBLE / sa.n_ch, 4) AS cont_a,
         |  round(n_common::DOUBLE / sb.n_ch, 4) AS cont_b
         |FROM common JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
         |WHERE 100 * n_common >= 60 * least(sa.n_ch, sb.n_ch)
         |ORDER BY id_a, id_b""".stripMargin,
    // the oracle asserts the round-trip invariant: every image the
    // Spark side renders must parse back to exactly its spec, so
    // n_parsed_exact == n_images and the dimension sums follow from
    // the spec arithmetic alone
    "m16_pixel_roundtrip" ->
      """WITH spec AS (
        |  SELECT doc_id, (doc_id % 29) + 1 AS w, (doc_id % 17) + 1 AS h,
        |    CASE (doc_id % 2) WHEN 0 THEN 'png' ELSE 'bmp' END AS format
        |  FROM documents)
        |SELECT format, count(*)::BIGINT AS n_images,
        |count(*)::BIGINT AS n_pixel_exact,
        |sum(w * h)::BIGINT AS n_pixels
        |FROM spec GROUP BY format ORDER BY format""".stripMargin,
    // the oracle replays the seed arithmetic alone: a group per PCM
    // seed, matched only if same-seed clips fingerprint identically
    // ACROSS containers and different-seed clips never collide
    "m17_audio_dedup" ->
      """SELECT min(doc_id)::BIGINT AS first_doc, count(*)::BIGINT AS n_docs
        |FROM documents GROUP BY doc_id % 40 HAVING count(*) > 1
        |ORDER BY 1""".stripMargin,
    // cut count from the consecutive-pair construction alone:
    // n_frames = (doc_id%6)+2, scenes change at even frame indexes ≥2
    "m18_scene_cuts" ->
      """SELECT doc_id AS id, ((doc_id % 6) + 2)::BIGINT AS n_frames,
        |(((doc_id % 6) + 1) // 2)::BIGINT AS n_cuts
        |FROM documents ORDER BY 1""".stripMargin,
    // the oracle replays the spec arithmetic; matching requires the
    // JDK-encoded container bytes to have parsed back exactly
    "m14_audio_meta" ->
      """WITH spec AS (
        |  SELECT doc_id,
        |    CASE (doc_id % 4) WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |      WHEN 2 THEN 22050 ELSE 44100 END AS sr,
        |    (doc_id % 2) + 1 AS ch,
        |    (doc_id % 997) + 1 AS nf,
        |    CASE (doc_id % 3) WHEN 0 THEN 'aiff' WHEN 1 THEN 'au'
        |      ELSE 'wav' END AS format
        |  FROM documents)
        |SELECT format, count(*)::BIGINT AS n_audio,
        |count(*)::BIGINT AS n_parsed_exact,
        |sum(nf)::BIGINT AS sum_frames, sum(sr)::BIGINT AS sum_rate
        |FROM spec GROUP BY format ORDER BY format""".stripMargin,
    "m11_image_meta" ->
      """WITH spec AS (
        |  SELECT doc_id, (doc_id % 29) + 1 AS w, (doc_id % 17) + 1 AS h,
        |    CASE (doc_id % 4) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |      WHEN 2 THEN 'gif' ELSE 'bmp' END AS format
        |  FROM documents)
        |SELECT format, count(*)::BIGINT AS n_images,
        |count(*)::BIGINT AS n_parsed_exact,
        |sum(w)::BIGINT AS sum_width, sum(h)::BIGINT AS sum_height
        |FROM spec GROUP BY format ORDER BY format""".stripMargin,
    // seed-arithmetic replay of the repeated-frame groups: every seed
    // reached by >1 (doc, frame) position is one exact frame-dup
    // cluster; matching requires the Spark side's animated-GIF
    // encode → frame decode → per-frame hash to be exact, complete
    // (every frame recovered), and frame-order-preserving
    "m15_gif_frame_dedup" ->
      """WITH f AS (
        |  SELECT doc_id::BIGINT AS id,
        |    unnest(generate_series(0, (doc_id % 3) + 1, 1)) AS fr
        |  FROM documents),
        |s AS (SELECT id, fr, (id * 7 + fr * 13) % 40 AS seed FROM f)
        |SELECT (min(id * 10 + fr) // 10)::BIGINT AS first_doc,
        |(min(id * 10 + fr) % 10)::BIGINT AS first_frame,
        |count(*)::BIGINT AS n_frames,
        |count(DISTINCT id)::BIGINT AS n_blobs
        |FROM s GROUP BY seed HAVING count(*) > 1
        |ORDER BY first_doc, first_frame""".stripMargin,
    // the oracle replays the integer thumbnail arithmetic from the
    // spec; the Spark side must have decoded, resized, re-encoded and
    // re-parsed actual bytes to land on the same numbers
    "m12_image_resize" ->
      """WITH spec AS (
        |  SELECT doc_id, (doc_id % 29) + 1 AS w, (doc_id % 17) + 1 AS h
        |  FROM documents)
        |SELECT doc_id, w::BIGINT AS src_w, h::BIGINT AS src_h,
        |CASE WHEN greatest(w, h) <= 8 THEN w
        |  ELSE greatest(1, (w * 8) // greatest(w, h)) END::BIGINT AS thumb_w,
        |CASE WHEN greatest(w, h) <= 8 THEN h
        |  ELSE greatest(1, (h * 8) // greatest(w, h)) END::BIGINT AS thumb_h
        |FROM spec ORDER BY doc_id""".stripMargin,
    // seed-arithmetic replay of the pixel-identical clusters: every
    // seed held by >1 document is one exact perceptual-dup cluster
    "m13_image_ahash_dedup" ->
      """WITH spec AS (SELECT doc_id, doc_id % 50 AS seed FROM documents)
        |SELECT min(doc_id)::BIGINT AS first_doc, count(*)::BIGINT AS n_docs
        |FROM spec GROUP BY seed HAVING count(*) > 1
        |ORDER BY first_doc""".stripMargin,
    // replay of the byte-4-gram (8 hex chars, stride 2) SimHash
    "m4_binary_simhash" ->
      ("""WITH hx AS (
        |  SELECT doc_id AS id, hex(text::BLOB) AS h FROM documents
        |), tk AS (
        |  SELECT id, substr(h, unnest(generate_series(1, greatest(1, len(h) - 7), 2))::INT, 8) AS tok
        |  FROM hx
        |), """.stripMargin + graft.queries.simhashReplaySql +
        "\nSELECT id, simhash FROM fp ORDER BY id"),
    "m5_embed_batched" ->
      """WITH h AS (
        |  SELECT doc_id, md5(text) AS hx FROM documents
        |), c AS (
        |  SELECT doc_id,
        |  list_transform(generate_series(0, 7), j -> ('0x' || substr(hx, j * 4 + 1, 4))::BIGINT) AS ks
        |  FROM h
        |)
        |SELECT doc_id, 8::BIGINT AS n_dims, list_sum(ks)::BIGINT AS int_sum,
        |md5(array_to_string(list_transform(ks, x -> x::VARCHAR), ',')) AS e_md5,
        |round(sqrt(list_sum(list_transform(ks, k -> (k / 65535.0 * 2 - 1) * (k / 65535.0 * 2 - 1)))), 4) AS norm
        |FROM c ORDER BY doc_id""".stripMargin,
    "m1_binary_meta" ->
      """SELECT doc_id, octet_length(text::BLOB) AS n_bytes,
        |CASE WHEN substring(text, 1, 3) = 'the' THEN 'type_the'
        |     WHEN substring(text, 1, 2) = 'a ' THEN 'type_a'
        |     ELSE 'type_raw' END AS format,
        |(octet_length(text::BLOB) + 255) // 256 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m3_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
        |), m AS (
        |  SELECT vec_id, v, list_min(v) AS vmin, list_max(v) AS vmax FROM e
        |), q AS (
        |  SELECT vec_id, vmin, vmax,
        |  list_transform(v, x -> CASE WHEN vmax = vmin THEN 0
        |    ELSE least(floor((x - vmin) * 255.0 / (vmax - vmin)), 255.0)::BIGINT END) AS ql
        |  FROM m
        |)
        |SELECT vec_id, len(ql)::BIGINT AS n_dims,
        |round(vmin, 4) AS vmin, round(vmax, 4) AS vmax,
        |list_sum(ql)::BIGINT AS q_sum,
        |md5(array_to_string(list_transform(ql, x -> x::VARCHAR), ',')) AS q_md5
        |FROM q ORDER BY vec_id""".stripMargin,
    // same grid arithmetic as m3's oracle, folded to the worst dim
    "m10_quantize_error" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
        |), m AS (
        |  SELECT vec_id, v, list_min(v) AS vmin, list_max(v) AS vmax FROM e
        |)
        |SELECT vec_id, round((vmax - vmin) / 255.0, 6) AS step,
        |round(list_max(list_transform(v, x ->
        |  abs(x - (CASE WHEN vmax = vmin THEN x
        |    ELSE vmin + least(floor((x - vmin) * 255.0 / (vmax - vmin)), 255.0)
        |      * (vmax - vmin) / 255.0 END)))), 6) AS max_abs_err
        |FROM m ORDER BY vec_id""".stripMargin,
    "m9_frame_dedup" ->
      """WITH f AS (
        |  SELECT doc_id AS id, text, (octet_length(text::BLOB) + 255) // 256 AS n_frames FROM documents
        |), fr AS (
        |  SELECT id, unnest(generate_series(0, n_frames - 1, 1)) AS frame_idx, text FROM f
        |), fx AS (
        |  SELECT id, md5(substring(text, (frame_idx * 256 + 1)::INT, 256)) AS frame_feature FROM fr
        |)
        |SELECT frame_feature, count(*) AS n_occ, count(DISTINCT id) AS n_docs, min(id) AS first_doc
        |FROM fx GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin,
    "m2_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id AS id, text, (octet_length(text::BLOB) + 255) // 256 AS n_frames FROM documents
        |), fr AS (
        |  SELECT id, unnest(generate_series(0, n_frames - 1, 4)) AS frame_idx, text FROM f
        |)
        |SELECT id, frame_idx, frame_idx * 256 AS frame_off,
        |octet_length(substring(text, (frame_idx * 256 + 1)::INT, 256)::BLOB) AS frame_len,
        |md5(substring(text, (frame_idx * 256 + 1)::INT, 256)) AS frame_feature
        |FROM fr ORDER BY id, frame_idx""".stripMargin)

  val oracleSql: Map[String, String] = oracleSqlRaw.map { case (k, v) =>
    k -> (if (qcCdcRows(k)) qcSampledSql(v, "documents", qcTextKeySql) else v)
  }
}
