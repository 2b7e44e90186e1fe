package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (BASELINE.json north-star): image / audio
  * / video payloads ride as opaque `binary` columns with typed metadata
  * alongside. The Spark-side machinery — schema shape, format sniffing,
  * batch-partitioned processing — is real and tested; the actual media
  * DECODE step is a clearly marked deterministic STUB (this environment
  * has no image/audio libraries), structured so a real decoder drops
  * into [[mapBatches]] without touching the pipeline.
  */
object Multimodal {

  /** Magic-number format sniff over the first bytes of a binary column —
    * pure built-ins (hex + substring ladder), codegen-friendly.
    */
  def sniffFormat(bin: Column): Column = {
    val h = hex(bin)   // uppercase hex
    when(substring(h, 1, 6) === "FFD8FF", "jpeg")
      .when(substring(h, 1, 16) === "89504E470D0A1A0A", "png")
      .when(substring(h, 1, 8) === "52494646" &&
        substring(h, 17, 8) === "57415645", "wav")     // RIFF....WAVE
      .when(substring(h, 9, 8) === "66747970", "mp4")  // ....ftyp
      .otherwise("unknown")
  }

  /** Typed metadata projection for a binary media column: byte length,
    * sniffed format, content hash. The partition-friendly "catalog"
    * columns a 100 TB media lake is organized by.
    */
  def attachMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("byte_len", octet_length(col(binCol)).cast(LongType))
      .withColumn("format", sniffFormat(col(binCol)))
      .withColumn("content_md5", md5(hex(col(binCol))))   // via hex: portable

  /** STUB image decode: deterministic fake dimensions derived from the
    * content hash — stands in for a real decoder's (width, height)
    * output so downstream resize/bucket logic is testable. Replace the
    * expression with a real codec via [[mapBatches]] in production.
    */
  def stubDecodeDims(bin: Column): (Column, Column) = {
    val h = md5(hex(bin))
    val w = (conv(substring(h, 1, 4), 16, 10).cast(IntegerType) % 1920 + 1)
      .cast(LongType)
    val ht = (conv(substring(h, 5, 4), 16, 10).cast(IntegerType) % 1080 + 1)
      .cast(LongType)
    (w, ht)
  }

  /** Batched per-partition processing — the Scala analogue of
    * `mapInPandas`: rows are fed to `f` in batches of `batchSize` (the
    * shape model-inference wants), results flattened back. Runs on
    * executors; `f` must be serializable.
    */
  def mapBatches(df: DataFrame, batchSize: Int, outSchema: StructType)(
      f: Seq[Row] => Seq[Row]): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => f(batch))
    }(enc)
  }

  /** Fixed-stride frame sampling over a binary payload: `n` evenly
    * spaced byte windows per blob, emitted as one row each with the
    * window's offset, length and content hash — the row shape and
    * fan-out of video keyframe extraction with the DEMUXER stubbed as
    * byte arithmetic (a real codec's keyframe index drops into the
    * offset expression; the downstream contract — n rows per blob,
    * (blob, frame_idx) key, binary frame column — is what a training
    * pipeline builds against). Row-local: a posexplode over a
    * computed offset array plus binary substring; no shuffle, no
    * state, scan-bound at any corpus size. Offsets are exact integer
    * arithmetic: frame i starts at `max(len − frameBytes, 0) · i
    * DIV (n−1) + 1` (1-based), so first/last frames pin to the
    * payload ends and short blobs yield n identical whole-payload
    * windows.
    */
  def frameSample(df: DataFrame, binCol: String, n: Int = 4,
                  frameBytes: Int = 16,
                  idCol: String = "doc_id"): DataFrame = {
    require(n >= 1, "need at least one frame")
    val len = octet_length(col(binCol)).cast(LongType)
    val denom = lit(math.max(n - 1, 1).toLong)
    val offs = array((0 until n).map { i =>
      call_function("div",
        greatest(len - frameBytes, lit(0L)) * lit(i.toLong), denom) + 1L
    }: _*)
    frameSampleAt(df, binCol, offs, frameBytes, idCol)
  }

  /** [[frameSample]] with CALLER-PROVIDED frame offsets — the demuxer
    * injection point made concrete: `offsets` is any per-row array of
    * 1-based byte positions (a container's keyframe index, a scene-cut
    * detector's output, a parsed atom table), and each position yields
    * one row under the identical downstream contract ((blob,
    * frame_idx) key, offset, length, content hash). [[frameSample]]
    * is exactly this with the fixed-stride arithmetic as `offsets` —
    * swapping the stub demuxer for a real one changes ONLY the offset
    * expression, never the pipeline around it. Row-local posexplode +
    * binary substring: no shuffle, no state, scan-bound.
    */
  def frameSampleAt(df: DataFrame, binCol: String, offsets: Column,
                    frameBytes: Int = 16,
                    idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol), col(binCol).as("_bin"),
        posexplode(transform(offsets, o => o.cast(LongType)))
          .as(Seq("frame_idx", "byte_offset")))
      .select(col(idCol), col("frame_idx").cast(LongType).as("frame_idx"),
        col("byte_offset"),
        col("_bin").substr(col("byte_offset"), lit(frameBytes))
          .as("frame"))
      .select(col(idCol), col("frame_idx"), col("byte_offset"),
        octet_length(col("frame")).cast(LongType).as("frame_len"),
        md5(hex(col("frame"))).as("frame_md5"))
      .orderBy(idCol, "frame_idx")

  /** Full media-meta pipeline over a constructed binary column (the
    * test tables carry no real media; documents' text bytes with a
    * per-row magic prefix exercise every sniff branch).
    */
  /** The constructed test payload (magic prefix + text bytes) shared
    * by [[mediaMeta]] and the frame-sample fixture.
    */
  def testPayload(df: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val magic = when(col(idCol) % 4 === 0,
        unhex(lit("FFD8FFE0")))                       // jpeg
      .when(col(idCol) % 4 === 1, unhex(lit("89504E470D0A1A0A")))  // png
      .when(col(idCol) % 4 === 2,
        unhex(lit("524946460000000057415645")))       // RIFF....WAVE
      .otherwise(unhex(lit("00")))                    // unknown
    df.select(col(idCol),
      concat(magic, encode(col(textCol), "UTF-8")).as("payload"))
  }

  def mediaMeta(df: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val withBin = testPayload(df, idCol, textCol)
    val meta = attachMeta(withBin, "payload")
    val (w, h) = stubDecodeDims(col("payload"))
    meta.select(col(idCol), col("byte_len"), col("format"),
        col("content_md5"), w.as("stub_width"), h.as("stub_height"))
      .orderBy(idCol)
  }

  // — perceptual near-dup (the gap exact chunk dedup can't close:
  //   re-encoded / brightened / resized copies share ZERO bytes) —

  /** Base synthetic-bitmap dims. Multiples of 9 (w) and 8 (h) so the
    * dHash grid cells tile pixels exactly AND the 2× upscale's cells
    * are exactly the doubled base cells (the invariance the fixture
    * exists to demonstrate — see [[graft.functions.DHash64]]).
    */
  private[graft] val BmpW = 18
  private[graft] val BmpH = 16

  /** Deterministic grayscale pixel expression — a textured
    * pseudo-random field per (doc, pixel), every step EXACT integer
    * arithmetic so a SQL oracle replays it bit-for-bit: two
    * multiply–xorshift mixing rounds (the classic 32-bit integer-hash
    * recipe) over k = (d·1024 + y·18 + x) reduced mod 2^31, then
    * mod 208. The mod-2^31 reduction BEFORE the first multiply keeps
    * every intermediate below 2^62.6 at ANY doc_id (r14 ADVICE: the
    * unreduced k·2654435761 wraps int64 — silently in Spark, as an
    * ERROR in DuckDB — once doc_id exceeds ~3.4M; note the advised
    * mod 2^32 is NOT enough, (2^32−1)·2654435761 ≈ 2^63.3 still
    * wraps, hence 2^31: first round < 2^62.4, second round
    * < 2^32·1597334677 ≈ 2^62.6). At the tested scale factors
    * (doc_id ≤ 5000 ⇒ k < 2^23) the reduction is the identity, so
    * every previously verified hash is bit-unchanged. Range
    * [0, 207] leaves headroom for the +16 brightness and +48 speckle
    * variants without byte overflow. A single multiplicative round is
    * NOT enough: it is a Weyl sequence — every doc sees the same slow
    * drift and 5,000 docs collapsed to ~500 distinct hashes; the
    * xorshift rounds make cross-doc dHash collisions vanish
    * (measured: 0 cross-doc pairs at 20k signatures).
    */
  private def pix(d: Column, x: Column, y: Column): Column = {
    val m31 = lit(2147483648L)
    val m32 = lit(4294967296L)
    val k = ((d % m31) * 1024L + y * 18L + x) % m31
    val h0 = (k * lit(2654435761L)) % m32
    val h1 = h0.bitwiseXOR(shiftright(h0, 13))
    val h2 = (h1 * lit(1597334677L)) % m32
    h2.bitwiseXOR(shiftright(h2, 16)) % 208
  }

  /** Synthetic near-duplicate image fixture: per input doc, FOUR raw
    * grayscale bitmaps (row-major bytes — the post-decode shape a real
    * codec emits) that are near-duplicates a byte-level dedup cannot
    * see:
    *
    *  - variant 0: the base 18×16 gradient;
    *  - variant 1: +16 uniform brightness (every byte differs);
    *  - variant 2: 2× pixel-doubled upscale, 36×32 (4× the bytes);
    *  - variant 3: one +48 speckle at (d mod 18, d mod 16) — a
    *    localized edit flipping ≤ 2 dHash bits (the speckled cell
    *    feeds exactly 2 adjacent-cell comparisons).
    *
    * Emits (id = doc_id·4 + variant, w, h, bmp). Bytes are built with
    * pure built-ins (per-pixel hex → unhex) — a FIXTURE generator, not
    * an engine path; production bitmaps arrive from a decoder and pay
    * none of this.
    */
  def synthBitmaps(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val d = col(idCol)
    def bmp(w: Int, h: Int)(p: (Column, Column) => Column): Column =
      unhex(array_join(transform(sequence(lit(0L), lit(w.toLong * h - 1)),
        i => lpad(hex(p(i % w, call_function("div", i, lit(w.toLong)))),
          2, "0")), ""))
    def variant(v: Int, w: Int, h: Int)(
        p: (Column, Column) => Column): DataFrame =
      df.select((d * 4 + v).as("id"), lit(w).as("w"), lit(h).as("h"),
        bmp(w, h)(p).as("bmp"))
    variant(0, BmpW, BmpH)((x, y) => pix(d, x, y))
      .unionByName(variant(1, BmpW, BmpH)((x, y) => pix(d, x, y) + 16))
      .unionByName(variant(2, BmpW * 2, BmpH * 2)((x, y) =>
        pix(d, call_function("div", x, lit(2L)),
          call_function("div", y, lit(2L)))))
      .unionByName(variant(3, BmpW, BmpH)((x, y) =>
        pix(d, x, y) + when(x === d % BmpW && y === d % BmpH, 48)
          .otherwise(0)))
  }

  /** Perceptual near-dup pairs over a bitmap table (id, w, h, bmp):
    * row-local [[graft.functions.DHash64]] signature pass (one scan,
    * codegen'd), then Hamming-banded pair generation via
    * [[Dedup.hamming64NearDups]] — pigeonhole blocks, never all-pairs.
    * This is the image twin of the text near-dup family: exact
    * chunk-level dedup ([[cdcDedupReport]]) finds byte-identical
    * storage, THIS finds re-encoded / brightened / resized copies.
    * `maxBucket` defaults high because the declared oracle row is an
    * exhaustive replay — production corpora set it like the text
    * family does.
    */
  def phashNearDups(bitmaps: DataFrame, maxDist: Int = 3,
                    maxBucket: Int = 100000): DataFrame =
    Dedup.hamming64NearDups(phashSigs(bitmaps), maxDist = maxDist,
      maxBucket = maxBucket)

  /** The row-local dHash signature pass of [[phashNearDups]] alone —
    * (id, sig) from a bitmap table. Exposed so the capped-bucket
    * audit ([[Dedup.hamming64CappedBuckets]]) and the staged-fixture
    * bench path share the exact signature expression with the pair
    * generator.
    */
  def phashSigs(bitmaps: DataFrame): DataFrame =
    graft.util.Utils.spread(bitmaps)
      .select(col("id"),
        graft.functions.DHash64.dHash64(col("bmp"), col("w"), col("h"))
          .as("sig"))

  // — audio perceptual near-dup (the `wav` branch of the multimodal
  //   matrix: amplitude-scaled / silence-padded re-encodes share no
  //   bytes with their source; the image side's dHash recipe
  //   transposed to 1-D closes the same gap) —

  /** Base synthetic-PCM sample count. A multiple of 65 so the
    * [[graft.functions.AudioHash64]] windows tile samples exactly
    * (10 per window) and the SQL oracle's window index is a plain
    * integer DIV — the BmpW/BmpH trick in one dimension.
    */
  private[graft] val PcmN = 650

  /** Deterministic signed-16-bit sample expression — the [[pix]]
    * two-round multiply–xorshift recipe over k = (d·1024 + t) mod
    * 2^31, mapped to 2·(h mod 8192) − 8191: range [−8191, 8191] and
    * always ODD, so no synthetic sample is ever zero — the silence
    * TRIM therefore removes exactly the explicit padding variant's
    * zeros and nothing else, keeping every variant's trimmed span
    * identical by construction (the property the invariance fixture
    * needs). All intermediates < 2^62.6 (the pix bound).
    */
  private def pcmSample(d: Column, t: Column): Column = {
    val m31 = lit(2147483648L)
    val m32 = lit(4294967296L)
    val k = ((d % m31) * 1024L + t) % m31
    val h0 = (k * lit(2654435761L)) % m32
    val h1 = h0.bitwiseXOR(shiftright(h0, 13))
    val h2 = (h1 * lit(1597334677L)) % m32
    (h2.bitwiseXOR(shiftright(h2, 16)) % 8192) * 2 - 8191
  }

  /** Synthetic near-duplicate audio fixture: per input doc, FOUR PCM
    * payloads (s16le bytes — the post-decode shape a real codec
    * emits) that are near-duplicates a byte-level dedup cannot see:
    *
    *  - variant 0: the base 650-sample signal;
    *  - variant 1: exact 2× amplitude (every byte differs);
    *  - variant 2: 37 leading + 23 trailing silence samples (the
    *    re-encode padding case; 700 samples, trim recovers the base);
    *  - variant 3: one +4096 glitch at sample (d mod 650) — a
    *    localized edit flipping ≤ 2 hash bits (the glitched window
    *    feeds exactly 2 adjacent-window comparisons).
    *
    * Emits (id = doc_id·4 + variant, pcm). Bytes are built with pure
    * built-ins (per-sample little-endian hex → unhex) — a FIXTURE
    * generator, not an engine path; production PCM arrives from a
    * decoder and pays none of this.
    */
  def synthPcm(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val d = col(idCol)
    def pcm(n: Int)(f: Column => Column): Column =
      unhex(array_join(transform(sequence(lit(0L), lit(n.toLong - 1)),
        t => {
          val u = f(t).bitwiseAND(lit(65535L))   // 16-bit two's complement
          concat(lpad(hex(u % 256), 2, "0"),     // little-endian: lo, hi
            lpad(hex(call_function("div", u, lit(256L))), 2, "0"))
        }), ""))
    def variant(v: Int, n: Int)(f: Column => Column): DataFrame =
      df.select((d * 4 + v).as("id"), pcm(n)(f).as("pcm"))
    val pad = 37
    variant(0, PcmN)(t => pcmSample(d, t))
      .unionByName(variant(1, PcmN)(t => pcmSample(d, t) * 2))
      .unionByName(variant(2, PcmN + pad + 23)(t =>
        when(t < pad || t >= pad + PcmN, lit(0L))
          .otherwise(pcmSample(d, t - pad))))
      .unionByName(variant(3, PcmN)(t =>
        pcmSample(d, t) +
          when(t === d % PcmN, 4096L).otherwise(0L)))
  }

  /** The row-local audio-fingerprint pass alone — (id, sig) from a
    * PCM table; shared by [[audioNearDups]] and the capped-bucket
    * audit, the [[phashSigs]] contract for the wav branch.
    */
  def audioSigs(pcms: DataFrame): DataFrame =
    graft.util.Utils.spread(pcms)
      .select(col("id"),
        graft.functions.AudioHash64.audioHash64(col("pcm")).as("sig"))

  /** Perceptual near-dup pairs over a PCM table (id, pcm): row-local
    * [[graft.functions.AudioHash64]] signature pass (one scan,
    * codegen'd), then the SAME Hamming-banded pair generation as the
    * image and simhash families ([[Dedup.hamming64NearDups]]
    * unchanged — pigeonhole blocks, never all-pairs). `maxBucket`
    * defaults high because the declared oracle row is an exhaustive
    * replay; production corpora set it like the text family does.
    */
  def audioNearDups(pcms: DataFrame, maxDist: Int = 3,
                    maxBucket: Int = 100000): DataFrame =
    Dedup.hamming64NearDups(audioSigs(pcms), maxDist = maxDist,
      maxBucket = maxBucket)

  /** Content-defined chunk table of a binary column: one row per
    * (blob, chunk) with exact offsets and the chunk content hash —
    * the input to chunk-level storage dedup. Chunking is the
    * row-local compiled [[graft.functions.CdcChunks]] expression
    * (boundaries realign on content, so shared substrings chunk
    * identically at any byte offset); the explode adds rows, not
    * shuffles.
    */
  def cdcChunkTable(df: DataFrame, binCol: String,
                    idCol: String = "doc_id",
                    chunker: Column => Column =
                      graft.functions.CdcChunks.cdcChunks): DataFrame =
    df.select(col(idCol),
        posexplode(chunker(col(binCol)))
          .as(Seq("chunk_idx", "c")))
      .select(col(idCol), col("chunk_idx"),
        col("c.offset").as("offset"), col("c.len").as("len"),
        col("c.chunk_md5").as("chunk_md5"))
      .orderBy(idCol, "chunk_idx")

  /** Chunk-level dedup report over a [[cdcChunkTable]]: how many
    * bytes would a content-addressed store actually keep. ONE
    * hash-keyed groupBy then a global rollup — the chunk table never
    * re-reads the blobs, and distinct bytes are exact (same md5 ⇒
    * same content ⇒ same length; `min` only pins determinism).
    */
  def cdcDedupReport(chunks: DataFrame): DataFrame = {
    val per = chunks.groupBy(col("chunk_md5"))
      .agg(count(lit(1)).as("copies"), min(col("len")).as("clen"))
    per.agg(
        sum(col("copies")).cast("long").as("n_chunks"),
        count(lit(1)).cast("long").as("distinct_chunks"),
        sum(col("copies") * col("clen")).cast("long")
          .as("total_bytes"),
        sum(col("clen")).cast("long").as("distinct_bytes"))
      .withColumn("dedup_ppm",
        expr("(1000000 * (total_bytes - distinct_bytes)) " +
          "DIV total_bytes"))
  }
}
