package graft.data

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A multimodal record: opaque media bytes + typed metadata. */
case class MediaDoc(doc_id: Long, media: Array[Byte], mime: String)

/** Decoded/extracted media features (stub decode — see [[Multimodal.decodeStub]]). */
case class MediaFeatures(
    doc_id: Long,
    byte_len: Int,
    header_hex: String,
    n_frames: Int,
    frames_hex: String,
    fingerprint: String
)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata; decode/feature-extract/frame-sample over partitions.
  *
  * The actual codec layer is STUBBED (this container has no image/audio
  * libraries): [[decodeStub]] produces deterministic fake features from the
  * raw bytes. Everything Spark-side — schema, partition-iterator batch shape,
  * binary column handling, metadata extraction — is real and tested; swap the
  * body of `decodeOne` for a real decoder (JNI/FFmpeg/ImageIO) without
  * touching the plan.
  *
  * Scale: metadata extraction is pure column expressions fused with the scan;
  * decode runs `mapPartitions` so each task amortizes codec init across its
  * partition (the Scala analogue of `mapInPandas` batching). Binary columns
  * stay off the shuffle: partition on ids, never on media bytes.
  */
object Multimodal {

  /** Column-expression metadata over a binary media column: length, header
    * bytes, strided frame samples (4 frames of 4 bytes at a 32-byte stride),
    * content fingerprint. Zero shuffle.
    */
  def metadata(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val b = col(binCol)
    val frames = (0 until 4).map(i => lower(hex(substring(b, 1 + 32 * i, 4))))
    df.select(
      col(idCol),
      length(b).as("byte_len"),
      lower(hex(substring(b, 1, 16))).as("header_hex"),
      concat_ws("-", frames: _*).as("frames_hex"),
      md5(b).as("fingerprint")
    )
  }

  /** View a text/binary column as a MediaDoc dataset (fixture path: real
    * deployments read binary columns from parquet directly).
    */
  def asMedia(df: DataFrame, idCol: String, binCol: String, mime: String): Dataset[MediaDoc] = {
    import df.sparkSession.implicits._
    df.select(
      col(idCol).cast("long").as("doc_id"),
      col(binCol).cast("binary").as("media"),
      lit(mime).as("mime")
    ).as[MediaDoc]
  }

  /** Deterministic stand-in for a media decoder. Real impl would decode
    * image/audio frames here.
    */
  private[data] def decodeOne(d: MediaDoc, frameStride: Int): MediaFeatures = {
    val bytes = d.media
    def hexAt(off: Int, len: Int): String =
      bytes.slice(off, math.min(off + len, bytes.length)).map("%02x".format(_)).mkString
    val nFrames = math.max(0, (bytes.length - 1) / frameStride + 1)
    val frames = (0 until math.min(nFrames, 4)).map(i => hexAt(i * frameStride, 4))
    MediaFeatures(
      doc_id = d.doc_id,
      byte_len = bytes.length,
      header_hex = hexAt(0, 16),
      n_frames = nFrames,
      frames_hex = frames.mkString("-"),
      fingerprint = java.security.MessageDigest
        .getInstance("MD5")
        .digest(bytes)
        .map("%02x".format(_))
        .mkString
    )
  }

  /** Partition-batched decode: codec init once per partition, rows streamed
    * through (the `mapInPandas` batch shape, Scala-typed).
    */
  def decodeStub(ds: Dataset[MediaDoc], frameStride: Int = 32): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real decoder would be initialized HERE, once per partition
      it.map(decodeOne(_, frameStride))
    }
  }

  /** 64-bit dHash-style perceptual fingerprint over a binary media column —
    * image-level NEAR-dup for the multimodal pipeline (the md5
    * `fingerprint` in [[metadata]] only catches byte-exact copies; a
    * re-encoded or slightly-edited image needs a PERCEPTUAL hash).
    *
    * Standard dHash (public domain, widely described — e.g. the
    * Krawetz "Kind of Like That" formulation): decode the image to a 9×8
    * luma grid, emit one bit per horizontally-adjacent pair, bit = left <
    * right — gradient signs survive re-encode/resize/brightness shifts
    * that break exact hashes. The DECODE step is this container's stub
    * (no image libs): the "luma grid" samples the raw bytes at 72 evenly
    * strided offsets (`grid g ∈ 0..71 → byte ⌊g·len/72⌋`) — swap the
    * sampling for a real decoder's grid without touching the bit/banding
    * machinery. Pure deterministic column ops end to end, so a SQL oracle
    * replays the hash bit-for-bit: Spark compares ONE-BYTE binary slices
    * (BinaryType ordering = unsigned byte order — a full-payload
    * `hex(bin)` here instead would be duplicated into all 128 sample
    * references by expression construction and measured 4.1 s for 5k
    * docs at sf0.1; the 1-byte slice is O(1) per sample), while the
    * DuckDB oracle compares the same bytes as two-char lowercase-hex
    * pairs lexicographically — hex digits are ASCII-ordered, so both
    * orderings are the SAME unsigned byte order and the fingerprints are
    * bit-identical. No UDF, stays inside whole-stage codegen.
    * Empty/short payloads degrade deterministically (clamped stride;
    * empty binary → fingerprint 0).
    */
  def perceptualHash(bin: Column): Column = {
    val len = length(bin).cast("long")
    // byte ⌊g·len/72⌋ as a one-byte binary slice; the products stay well
    // under 2^53, so the double division is exact
    def sample(g: Int): Column =
      bin.substr((floor(lit(g.toLong) * len / lit(72)) + 1).cast("int"), lit(1))
    (for { r <- 0 until 8; c <- 0 until 8 } yield {
      val b = r * 8 + c
      when(sample(r * 9 + c) < sample(r * 9 + c + 1), lit(1L << b)).otherwise(lit(0L))
    }).reduce(_ bitwiseOR _)
  }

  /** Hamming-banded perceptual near-dup pairs: `(a_id, b_id, hamming)` for
    * every pair within `maxHamming` bits that shares at least one
    * fingerprint band. The [[graft.data.Dedup.simhash]]-family banding
    * shape: split the 64-bit fingerprint into `64/bandBits` bands, pair
    * only rows colliding on `(band index, band value)` — by pigeonhole a
    * pair with hamming < 64/bandBits ALWAYS shares a clean band, so at
    * the defaults (bandBits=8 → 8 bands, maxHamming=7) the banded join is
    * EXACT for its own threshold, never just probabilistic. Candidates
    * shuffle on the (band, value) key only — never all-pairs; at
    * billion-image scale widen to bandBits=16 (4 bands, exact through
    * hamming 3, 65536-value buckets → ~256× fewer collisions per band)
    * — the dedup-family rule that bucket grain must grow with the corpus.
    * A pair sharing several bands is emitted once (the distinct is at
    * pair grain, after the hamming filter cuts the candidate volume).
    */
  def perceptualPairs(
      df: DataFrame,
      idCol: String,
      binCol: String,
      maxHamming: Int = 7,
      bandBits: Int = 8
  ): DataFrame = {
    require(64 % bandBits == 0, s"perceptualPairs: bandBits=$bandBits must divide 64")
    require(maxHamming >= 0, s"perceptualPairs: maxHamming=$maxHamming")
    val nBands = 64 / bandBits
    require(maxHamming < nBands,
      s"perceptualPairs: maxHamming=$maxHamming >= $nBands bands — the banded join " +
        s"would MISS qualifying pairs (pigeonhole guarantee is hamming < nBands); " +
        s"narrow bandBits or lower maxHamming")
    val mask = (1L << bandBits) - 1
    // ComputeOnce barrier is load-bearing: the band array references _fp
    // nBands+1 times, and CollapseProject would otherwise inline the full
    // fingerprint subtree (hex of the whole payload + 72 substrings + 64
    // compares) into every reference — measured 5.1 s → ~1 s at sf0.1
    val banded = df
      .select(
        col(idCol).as("_id"),
        graft.functions.ComputeOnce(perceptualHash(col(binCol))).as("_fp"))
      .select(col("_id"), col("_fp"), explode(array((0 until nBands).map { b =>
        struct(
          lit(b).as("bi"),
          shiftright(col("_fp"), b * bandBits).bitwiseAND(lit(mask)).as("bv"))
      }: _*)).as("_band"))
      .select(col("_id"), col("_fp"), col("_band.bi").as("bi"), col("_band.bv").as("bv"))
      // repartition on the JOIN key with an EXPLICIT partition count:
      // per-probe work is bucketRows, not 1, so probe-side parallelism
      // decides the wall clock (a one-split input ran the whole 17M-probe
      // pass at sf0.1 on one core), and the row payload is bytes-tiny —
      // AQE would coalesce an advisory-sized shuffle right back to one
      // partition (the work is pair-count-shaped, not byte-shaped). This
      // is the distribution a shuffled join requires anyway, so the
      // exchange is reused, never redundant
      .repartition(
        df.sparkSession.sessionState.conf.numShufflePartitions,
        col("bi"), col("bv"))
    val lhs = banded.select(col("_id").as("a_id"), col("_fp").as("_fpa"), col("bi"), col("bv"))
    val rhs = banded.select(col("_id").as("b_id"), col("_fp").as("_fpb"), col("bi"), col("bv"))
    lhs.join(rhs, Seq("bi", "bv"))
      .filter(col("a_id") < col("b_id"))
      .select(
        col("a_id"),
        col("b_id"),
        bit_count(col("_fpa").bitwiseXOR(col("_fpb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
