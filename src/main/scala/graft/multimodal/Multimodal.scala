package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item: opaque binary payload + typed metadata.
  * At 100 TB this is the row shape of a multimodal lakehouse table —
  * payloads inline up to ~1 MB, larger ones as object-store pointers
  * (the `uri` field), partitioned by ingest date and bucketed by id.
  */
case class MediaItem(
    doc_id: Long,
    payload: Array[Byte],
    uri: String,
    fmt: String,
    width: Int,
    height: Int)

case class MediaFeatures(
    doc_id: Long,
    n_bytes: Long,
    mean_byte: Double,
    nonzero_ratio: Double,
    feat: Array[Double])

/** Multimodal column pipeline (SURVEY.md §2.G).
  *
  * The decode step is STUBBED (this container has no image/audio
  * codecs): `decodeStub` derives deterministic pseudo-features from the
  * payload bytes. Everything around it — the typed schema, the
  * per-partition batch iteration (the Scala analog of a Pandas-UDF
  * `mapInPandas` batch), the partition sizing, and the downstream
  * aggregation — is the real Spark plumbing a codec would drop into.
  */
object Multimodal {

  /** Synthesize the media table from documents: utf-8 payload stands in
    * for an encoded image; metadata is derived deterministically.
    *
    * ASCII contract: the `mm_integrity` and `mm_audio_windows` oracles
    * walk the payload CHARACTER-wise in DuckDB while Spark checksums
    * UTF-8 BYTES, so their parity (checksum, n_bytes, width-vs-length
    * metadata) holds only when every char is single-byte. The synthetic
    * corpus satisfies this and `MultimodalSpec` pins it (payload byte
    * length == n_chars for every document); a real multi-byte corpus
    * would need byte-wise oracles instead.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        concat(lit("synthetic://doc/"), col("doc_id")).as("uri"),
        lit("fake/raw").as("fmt"),
        (pmod(col("n_chars"), lit(64)) + 1).cast("int").as("width"),
        (pmod(col("n_chars"), lit(48)) + 1).cast("int").as("height"))
      .as[MediaItem]
  }

  // one payload object store per source dataset, written once per JVM
  private val objStores = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Materialize each payload as one object in a local object store
    * (file:// scheme standing in for s3://; same Hadoop FileSystem API
    * either way) and remember the store root. Idempotent per dataset —
    * a _SUCCESS marker skips the rewrite.
    */
  private def objectStoreFor(spark: SparkSession, dir: String): String =
    objStores.computeIfAbsent(dir, _ => {
      val base = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_objstore_" + graft.Tables.fingerprint(s"$dir/documents.parquet")).toString
      val marker = new java.io.File(base, "_SUCCESS")
      if (!marker.exists()) {
        mediaTable(spark, dir).foreachPartition { (it: Iterator[MediaItem]) =>
          val conf = new org.apache.hadoop.conf.Configuration()
          val fs = org.apache.hadoop.fs.FileSystem.get(
            new java.net.URI(s"file://$base/"), conf)
          it.foreach { m =>
            val p = new org.apache.hadoop.fs.Path(s"file://$base/doc_${m.doc_id}.bin")
            val out = fs.create(p, true)
            try out.write(m.payload) finally out.close()
          }
        }
        marker.createNewFile()
      }
      base
    })

  /** The pointer-only media table — the >1 MB row shape at 100 TB: the
    * table row carries metadata plus a `uri` pointer; the payload bytes
    * live in the object store, not in the table.
    */
  def pointerTable(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    val store = objectStoreFor(spark, dir)
    mediaTable(spark, dir).map(m => m.copy(
      payload = Array.emptyByteArray,
      uri = s"file://$store/doc_${m.doc_id}.bin"))
  }

  /** Pointer-dereferencing fetch stage ahead of decode: items that
    * carry bytes inline pass through; pointer-only items are fetched
    * through ONE Hadoop FileSystem handle per (partition, scheme) —
    * the batch-amortized setup a real s3:// fetch needs. Fetch and
    * decode stay separate stages so sampling/filtering can run between
    * them (pay IO only for the items that survive).
    */
  def fetchPayloads(items: Dataset[MediaItem]): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      lazy val conf = new org.apache.hadoop.conf.Configuration()
      val fsCache = scala.collection.mutable.HashMap
        .empty[String, org.apache.hadoop.fs.FileSystem]
      it.map { m =>
        if (m.payload != null && m.payload.nonEmpty) m
        else {
          val uri = new java.net.URI(m.uri)
          val fs = fsCache.getOrElseUpdate(
            uri.getScheme + Option(uri.getAuthority).getOrElse(""),
            org.apache.hadoop.fs.FileSystem.get(uri, conf))
          val p = new org.apache.hadoop.fs.Path(uri)
          // stream to EOF — one open() RPC per object, no getFileStatus
          // metadata round-trip (which doubled per-object latency on
          // KB-scale payloads)
          val in = fs.open(p)
          val bos = new java.io.ByteArrayOutputStream(8192)
          try {
            val tmp = new Array[Byte](65536)
            var r = in.read(tmp)
            while (r >= 0) { bos.write(tmp, 0, r); r = in.read(tmp) }
          } finally in.close()
          m.copy(payload = bos.toByteArray)
        }
      }
    }
  }

  /** The codec integration point: one instance per partition drives a
    * batch of items — init (codec handles, model weights) happens once
    * in `decode` before the iterator is consumed, amortized across the
    * partition. Implementations must be Serializable (constructed on
    * the driver, shipped to executors).
    */
  trait MediaDecoder extends Serializable {
    def decode(items: Iterator[MediaItem]): Iterator[MediaFeatures]
  }

  /** STUB decoder: byte statistics standing in for codec output (this
    * container has no image/audio codecs). A real implementation swaps
    * in behind [[MediaDecoder]] without touching the pipeline plumbing.
    */
  object StubDecoder extends MediaDecoder {
    override def decode(items: Iterator[MediaItem]): Iterator[MediaFeatures] =
      decodeStub(items)
  }

  private def decodeStub(items: Iterator[MediaItem]): Iterator[MediaFeatures] = {
    // per-partition setup would happen here (codec init, model load)
    items.map { m =>
      val bytes = m.payload
      val n = bytes.length.toLong
      var sum = 0L
      var nz = 0L
      val hist = new Array[Double](4)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sum += b
        if (b != 0) nz += 1
        hist(b % 4) += 1.0
        i += 1
      }
      MediaFeatures(m.doc_id, n,
        if (n == 0) 0.0 else sum.toDouble / n,
        if (n == 0) 0.0 else nz.toDouble / n,
        hist.map(h => if (n == 0) 0.0 else h / n))
    }
  }

  /** A "video": the payload chunked into fixed-size frames. */
  case class VideoItem(doc_id: Long, frames: Array[Array[Byte]], fps: Int)

  case class FrameStats(doc_id: Long, n_frames: Int, n_sampled: Int, mean_sampled_byte: Double)

  /** G2: frame sampling — every k-th frame of each chunked payload goes
    * through the (stubbed) per-frame decode; the per-partition iterator
    * shape is where a real codec/model batch call plugs in. Sampling
    * happens BEFORE decode, which is the entire point at 100 TB: IO and
    * decode cost scale with sampled frames, not stored frames.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val every = 4
    val frameBytes = 64
    val videos = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        VideoItem(id, payload.grouped(frameBytes).toArray, 30)
      }
    videos.mapPartitions { items =>
      // per-partition codec init would go here (STUB)
      items.map { v =>
        val sampled = v.frames.indices.by(every).map(v.frames)
        val bytes = sampled.flatten
        FrameStats(v.doc_id, v.frames.length, sampled.length,
          if (bytes.isEmpty) 0.0
          else bytes.map(b => (b & 0xff).toLong).sum.toDouble / bytes.length)
      }
    }.select(col("doc_id"), col("n_frames"), col("n_sampled"),
      (floor(col("mean_sampled_byte") * 10000 + 0.5) / 10000).as("mean_sampled_byte"))
  }

  case class AudioFeatures(doc_id: Long, n_win: Int, total_energy: Long,
      peak_win: Int, peak_energy: Long)

  /** G3: audio-style windowed features — the payload treated as a PCM
    * sample stream, chopped into fixed 32-byte windows with per-window
    * energy (Σ sample²), peak-window detection, total energy. The
    * per-partition iterator is where a real audio codec/VAD model
    * batches; arithmetic is exact integers, so the ASCII-byte oracle
    * matches bit-for-bit. Peak ties resolve to the FIRST max window on
    * both engines.
    */
  def audioFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val win = 32
    mediaTable(spark, dir).mapPartitions { items =>
      // per-partition codec/model init would go here (STUB)
      // zero-length payloads yield no windows and no row — matching the
      // oracle, whose UNNEST(range(0)) drops empty docs entirely
      items.filter(_.payload.nonEmpty).map { m =>
        val b = m.payload
        val n = (b.length + win - 1) / win
        var total = 0L; var peak = 0L; var peakI = 0
        var w = 0
        while (w < n) {
          var e = 0L
          var i = w * win
          val end = math.min((w + 1) * win, b.length)
          while (i < end) { val v = (b(i) & 0xff).toLong; e += v * v; i += 1 }
          total += e
          if (e > peak) { peak = e; peakI = w }
          w += 1
        }
        AudioFeatures(m.doc_id, n, total, peakI, peak)
      }
    }.toDF()
  }

  case class IntegrityRow(doc_id: Long, n_bytes: Long, kind: String,
      checksum: Long, meta_ok: Boolean)

  /** G4: payload integrity — the ingest-validation pass a multimodal
    * lakehouse runs before paying decode cost: per payload, a
    * magic-byte format sniff (here the stub classes text/digit/other —
    * a real table checks JPEG/PNG/RIFF magics in the same first-bytes
    * slot), a polynomial checksum of the full byte stream, and a
    * metadata-consistency check (payload length vs the width metadata
    * derived from it at ingest). The corpus is intact by construction,
    * so both engines TRUNCATE every 50th payload by one byte first —
    * the PII-injection trick — and the gate proves known corruption is
    * flagged (checksum shifts, meta_ok false), not that nothing is
    * wrong. One mapPartitions pass, exact integer arithmetic
    * throughout.
    */
  def integrity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val M = 1000000007L
    mediaTable(spark, dir)
      .mapPartitions { items =>
        items.map { m0 =>
          // truncation injection folded into the same pass — no second
          // encoder round-trip over the payload arrays
          val m = if (m0.doc_id % 50 == 0) m0.copy(payload = m0.payload.dropRight(1))
                  else m0
          val b = m.payload
          var h = 0L
          var i = 0
          while (i < b.length) { h = (h * 131 + (b(i) & 0xff)) % M; i += 1 }
          val kind =
            if (b.isEmpty) "empty"
            else {
              val c = b(0) & 0xff
              if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) "text"
              else if (c >= '0' && c <= '9') "digit" else "other"
            }
          IntegrityRow(m.doc_id, b.length.toLong, kind, h,
            (b.length % 64) + 1 == m.width)
        }
      }.toDF()
  }

  /** G1: the full pipeline — pointer table → uri fetch → per-partition
    * batch decode → feature columns. Payloads are NOT inline: the
    * pipeline reads them through the object-store pointer path
    * (fetchPayloads), which is how a >1 MB-payload table works at
    * 100 TB. Output is identical to the inline path, so the same
    * DuckDB oracle gates it.
    */
  def pipeline(spark: SparkSession, dir: String): DataFrame =
    pipelineWith(spark, dir, StubDecoder)

  /** G5: perceptual-hash payload near-dup — the multimodal twin of
    * SimHash (D3): re-encoded/trailing-edit copies of the same media
    * asset have different checksums (G4 can't catch them) but nearly
    * identical CONTENT, so each payload gets a 60-bit blockhash
    * fingerprint (bit j = is block j's byte mean above the whole
    * payload's mean — the classic aHash/Blockhash shape on pixel
    * data) and pairs within hamming distance 5 are flagged.
    *
    * The sign test is the exact integer cross-product
    * `blocksum*n > tot*blocklen` (no FP anywhere), computed on the
    * payload BYTES — equal to the text characters under the
    * mediaTable ASCII contract, which is how the DuckDB oracle
    * replays it via ascii(). Twin payloads (trailing 2 bytes edited,
    * doc_id+3000000) are injected so near-but-not-equal pairs exist.
    * Candidates come from 6×10-bit chunk blocking: hd ≤ 5 means some
    * chunk is untouched (pigeonhole), so the blocked join is EXACT —
    * the D3 argument, Σ bucket² work instead of corpus².
    */
  def phashDedup(spark: SparkSession, dir: String): DataFrame =
    phashDedupOn(Tables.documents(spark, dir))

  /** DataFrame-generic payload phash dedup; input needs (doc_id, text).
    * Exposed so the scale probe can drive the same plan over
    * replicated corpora.
    */
  def phashDedupOn(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    val twins = base.filter(pmod(col("doc_id"), lit(20)) === 0)
      .select((col("doc_id") + lit(3000000L)).as("doc_id"),
        expr("concat(substring(text, 1, greatest(length(text) - 2, 0)), 'zz')")
          .as("text"))
    // one codegen byte loop per payload (graft.functions.BlockHash) —
    // the HOF formulation (per-char ascii array + 60 interpreted
    // slice-folds) computed the identical fingerprint ~4x slower
    val fps = base.unionByName(twins)
      .withColumn("fp",
        graft.functions.BlockHash.column(base.sparkSession, col("text")))
      .select(col("doc_id"), col("fp")).cache()
    val chunks = fps.select(col("doc_id"), col("fp"),
      explode(array((0 until 6).map(c =>
        struct(lit(c).as("c"),
          shiftright(col("fp"), c * 10).bitwiseAND(lit(1023L)).as("ch"))): _*))
        .as("cc"))
      .select(col("doc_id"), col("fp"), col("cc.c").as("c"), col("cc.ch").as("ch"))
    chunks.select(col("doc_id").as("ia"), col("fp").as("fa"), col("c"), col("ch"))
      .join(chunks.select(col("doc_id").as("ib"), col("fp").as("fb"),
        col("c"), col("ch")), Seq("c", "ch"))
      .filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        expr("bit_count(fa ^ fb)").cast("long").as("hd"))
      .distinct()
      .filter(col("hd") <= 5)
  }

  /** The pipeline with a caller-supplied codec behind [[MediaDecoder]]. */
  def pipelineWith(spark: SparkSession, dir: String,
      decoder: MediaDecoder): DataFrame = {
    import spark.implicits._
    val feats = fetchPayloads(
      pointerTable(spark, dir)
        .repartition(col("doc_id"))) // spread fetch IO evenly pre-decode
      .mapPartitions(decoder.decode _)
    // floor-based rounding: the underlying doubles are bit-identical to
    // the oracle's (exact integer sums / lengths), so floor(x*1e4+0.5)
    // can never disagree — round() can, on decimal-tie expansions like
    // sum/160
    def r4(c: org.apache.spark.sql.Column) = floor(c * 10000 + 0.5) / 10000
    feats.select(col("doc_id"), col("n_bytes"),
      r4(col("mean_byte")).as("mean_byte"),
      r4(col("nonzero_ratio")).as("nonzero_ratio"),
      r4(element_at(col("feat"), 1)).as("f0"),
      r4(element_at(col("feat"), 2)).as("f1"))
  }
}
