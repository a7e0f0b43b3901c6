package graft.interop

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}

/** Delta Lake deletion-vector (DV) decoding — the READ leg only.
  *
  * A Delta `add` action may carry a `deletionVector` descriptor
  * marking row positions of the file as deleted (the public Delta
  * protocol's row-level-delete mechanism, on by default in modern
  * writers). The descriptor names where the serialized bitmap lives
  * (`storageType` u/p/i), and the bitmap itself is a 64-bit
  * RoaringBitmap in the "portable" format (magic + per-key 32-bit
  * bitmaps). This object resolves the descriptor to bytes, validates
  * the on-disk framing (size word + CRC32), and materializes the
  * deleted row ordinals.
  *
  * Everything here follows the public Delta protocol spec
  * (PROTOCOL.md "Deletion Vector Descriptor Schema" / "Deletion
  * Vector Format") and the public RoaringFormatSpec; the 32-bit
  * container decoding delegates to org.roaringbitmap (a Spark
  * dependency). Reference analog: the Delta leg of xTable
  * (xtable/xtable_delta.yaml) — DV'd tables are what a modern Delta
  * writer hands that pipeline. */
private[graft] object DeltaDv {

  /** Z85 (ZeroMQ base-85) alphabet — the variant the Delta spec names
    * for `pathOrInlineDv`. */
  private val Z85 =
    "0123456789abcdefghijklmnopqrstuvwxyz" +
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Index: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** Decode a Z85 string (length % 5 == 0) to bytes (length % 4 == 0).
    * Refuses malformed input loudly — a corrupt descriptor must never
    * silently resolve to a wrong file or wrong bitmap. */
  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0,
      s"Z85 string length ${s.length} is not a multiple of 5: '$s'")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Index(c.toInt) else -1
        require(d >= 0, s"invalid Z85 character '$c' in '$s'")
        v = v * 85 + d
        j += 1
      }
      require(v <= 0xFFFFFFFFL,
        s"Z85 group '${s.substring(i, i + 5)}' overflows 32 bits")
      val o = i / 5 * 4
      out(o) = (v >>> 24).toByte
      out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte
      out(o + 3) = v.toByte
      i += 5
    }
    out
  }

  /** Z85-encode bytes (test fixtures forge descriptors with this). */
  def z85Encode(b: Array[Byte]): String = {
    require(b.length % 4 == 0,
      s"Z85 payload length ${b.length} is not a multiple of 4")
    val sb = new StringBuilder(b.length / 4 * 5)
    var i = 0
    while (i < b.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (b(i + j) & 0xFFL); j += 1 }
      val grp = new Array[Char](5)
      var k = 4
      while (k >= 0) { grp(k) = Z85((v % 85).toInt); v /= 85; k -= 1 }
      sb.appendAll(grp)
      i += 4
    }
    sb.toString
  }

  /** The `deletionVector` descriptor fields this reader consumes. */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Long], sizeInBytes: Int, cardinality: Long)

  /** Resolve a `storageType=u` relative descriptor to its on-disk
    * path: `pathOrInlineDv` is `<randomPrefix><20-char Z85 uuid>`; the
    * file lives at `<tableRoot>/[prefix/]deletion_vector_<uuid>.bin`
    * (the public spec's derived-name scheme). */
  def resolveRelativePath(tableRoot: String, pathOrInlineDv: String): Path = {
    require(pathOrInlineDv.length >= 20,
      s"storageType=u pathOrInlineDv '$pathOrInlineDv' is shorter than " +
      "a Z85-encoded uuid (20 chars)")
    val prefix = pathOrInlineDv.dropRight(20)
    val bytes = z85Decode(pathOrInlineDv.takeRight(20))
    val bb = ByteBuffer.wrap(bytes) // Z85 payload is big-endian
    val uuid = new java.util.UUID(bb.getLong, bb.getLong)
    val name = s"deletion_vector_$uuid.bin"
    if (prefix.isEmpty) Paths.get(tableRoot, name)
    else Paths.get(tableRoot, prefix, name)
  }

  /** The serialized-bitmap bytes of one descriptor. `u`/`p` read the
    * framed blob from the DV file (1-byte-version file; at `offset`: a
    * 4-byte big-endian size that must equal `sizeInBytes`, the data,
    * then a 4-byte big-endian CRC32 over the data — both checked, a
    * mismatch refuses loudly); `i` decodes the inline Z85 payload. */
  def bitmapBytes(tableRoot: String, d: Descriptor): Array[Byte] =
    d.storageType match {
      case "i" =>
        require(d.offset.isEmpty,
          "inline deletion vector must not carry an offset")
        val raw = z85Decode(d.pathOrInlineDv)
        require(raw.length >= d.sizeInBytes,
          s"inline deletion vector decodes to ${raw.length} bytes, " +
          s"fewer than sizeInBytes=${d.sizeInBytes}")
        raw.take(d.sizeInBytes) // Z85 pads to a 4-byte boundary
      case "u" | "p" =>
        val p =
          if (d.storageType == "u")
            resolveRelativePath(tableRoot, d.pathOrInlineDv)
          else Paths.get(d.pathOrInlineDv.replaceFirst("^file:/+", "/"))
        require(Files.isRegularFile(p),
          s"deletion-vector file $p does not exist")
        val all = Files.readAllBytes(p)
        val off = d.offset.getOrElse(1L).toInt // past the version byte
        require(all.length >= off + 4 + d.sizeInBytes + 4,
          s"deletion-vector file $p (${all.length} bytes) is too short " +
          s"for offset=$off + sizeInBytes=${d.sizeInBytes} + checksum")
        val bb = ByteBuffer.wrap(all) // framing is big-endian
        val size = bb.getInt(off)
        require(size == d.sizeInBytes,
          s"deletion-vector file $p: stored size $size at offset $off " +
          s"!= descriptor sizeInBytes ${d.sizeInBytes} — a corrupt or " +
          "mis-addressed blob this reader refuses")
        val data = java.util.Arrays.copyOfRange(all, off + 4,
          off + 4 + d.sizeInBytes)
        val crc = new java.util.zip.CRC32
        crc.update(data)
        val stored = bb.getInt(off + 4 + d.sizeInBytes) & 0xFFFFFFFFL
        require(stored == crc.getValue,
          s"deletion-vector file $p: CRC32 mismatch (stored $stored, " +
          s"computed ${crc.getValue}) — refusing a corrupt bitmap")
        data
      case other => throw new IllegalArgumentException(
        s"unknown deletion-vector storageType '$other' — this reader " +
        "implements u (relative), p (absolute), i (inline)")
    }

  private val PortableMagic = 1681511377

  /** Deserialize the portable 64-bit RoaringBitmap format: a 4-byte
    * little-endian magic, an 8-byte little-endian bitmap count, then
    * per bitmap a 4-byte little-endian key (the row ordinal's high 32
    * bits) followed by a standard 32-bit RoaringBitmap. Returns the
    * deleted row ordinals in ascending order. */
  def decodeBitmap(data: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.remaining >= 12,
      s"deletion-vector bitmap truncated (${data.length} bytes)")
    val magic = bb.getInt
    require(magic == PortableMagic,
      s"deletion-vector bitmap magic $magic != $PortableMagic (the " +
      "portable RoaringBitmap format) — refusing to guess the layout")
    val n = bb.getLong
    require(n >= 0 && n <= Int.MaxValue,
      s"deletion-vector bitmap declares $n 32-bit bitmaps")
    val out = Array.newBuilder[Long]
    var i = 0L
    while (i < n) {
      val key = bb.getInt.toLong & 0xFFFFFFFFL
      val rb = new org.roaringbitmap.RoaringBitmap()
      rb.deserialize(bb)
      bb.position(bb.position() + rb.serializedSizeInBytes())
      rb.forEach(new org.roaringbitmap.IntConsumer {
        override def accept(v: Int): Unit = {
          out += (key << 32) | (v.toLong & 0xFFFFFFFFL)
          ()
        }
      })
      i += 1
    }
    out.result()
  }

  /** Serialize row ordinals into the portable 64-bit format — the
    * inverse of [[decodeBitmap]], used by test fixtures and gates to
    * forge DVs against the public spec shapes. */
  def encodeBitmap(ordinals: Seq[Long]): Array[Byte] = {
    val byKey = ordinals.groupBy(o => (o >>> 32).toInt).toSeq.sortBy(_._1)
    val bitmaps = byKey.map { case (k, os) =>
      val rb = new org.roaringbitmap.RoaringBitmap()
      os.foreach(o => rb.add(o.toInt))
      rb.runOptimize()
      (k, rb)
    }
    val size = 12 + bitmaps.map(4 + _._2.serializedSizeInBytes()).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(PortableMagic)
    bb.putLong(bitmaps.size.toLong)
    bitmaps.foreach { case (k, rb) =>
      bb.putInt(k)
      rb.serialize(bb)
    }
    bb.array()
  }

  /** Frame a serialized bitmap as a DV FILE's bytes (version byte,
    * size word, data, CRC32) and return (fileBytes, offset). */
  def frameFile(bitmap: Array[Byte]): (Array[Byte], Long) = {
    val bb = ByteBuffer.allocate(1 + 4 + bitmap.length + 4)
    bb.put(1.toByte)
    bb.putInt(bitmap.length)
    bb.put(bitmap)
    val crc = new java.util.zip.CRC32
    crc.update(bitmap)
    bb.putInt(crc.getValue.toInt)
    (bb.array(), 1L)
  }

  /** Deleted row ordinals of one descriptor, validated against its
    * declared cardinality (a mismatch means a corrupt DV — refuse
    * rather than resurrect or over-delete). */
  def deletedOrdinals(tableRoot: String, d: Descriptor): Array[Long] = {
    val ords = decodeBitmap(bitmapBytes(tableRoot, d))
    require(ords.length.toLong == d.cardinality,
      s"deletion vector decodes to ${ords.length} ordinals but " +
      s"declares cardinality ${d.cardinality} — a corrupt DV this " +
      "reader refuses")
    ords
  }
}
