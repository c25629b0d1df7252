package graft.index

import java.io.ByteArrayOutputStream

/** Delta + variable-byte codec for posting lists.
  *
  * Posting runs are sorted by docID within a term; docIDs are
  * delta-encoded (gap from previous) then varbyte-encoded (7 bits per
  * byte, high bit = continuation). Term frequencies and doc lengths are
  * varbyte-encoded directly (small positive ints).
  *
  * This is the compression layer the north rule mandates ("sorted
  * (docID, tf) runs with delta + variable-byte compression"). The
  * reference has no compression of its own — its columnar tier leans on
  * Parquet/snappy (/root/reference/packages/core/spheraform_core/storage/geoparquet.py:147-164);
  * we compress postings explicitly so a block can be skipped without
  * decoding (block-max WAND).
  */
object Codec {

  /** Varbyte-encode one non-negative long into the buffer. */
  @inline def writeVLong(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    require(v >= 0, s"varbyte requires non-negative value, got $v")
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Encode longs as raw varbyte (no delta). */
  def encodeVarByte(values: Array[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(values.length * 2)
    var i = 0
    while (i < values.length) { writeVLong(out, values(i)); i += 1 }
    out.toByteArray
  }

  /** Decode `n` varbyte longs. */
  def decodeVarByte(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var bi = 0
    var i = 0
    while (i < n) {
      var v = 0L
      var shift = 0
      var b = bytes(bi)
      bi += 1
      while ((b & 0x80) != 0) {
        v |= (b & 0x7fL) << shift
        shift += 7
        b = bytes(bi)
        bi += 1
      }
      v |= (b & 0x7fL) << shift
      out(i) = v
      i += 1
    }
    out
  }

  /** Delta-encode a strictly increasing docID run, then varbyte.
    * First value is stored as a gap from `base` (the block's docID
    * floor), so blocks are independently decodable.
    */
  def encodeDeltas(sorted: Array[Long], base: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream(sorted.length * 2)
    var prev = base
    var i = 0
    while (i < sorted.length) {
      val v = sorted(i)
      require(v >= prev, s"docIDs must be non-decreasing: $v after $prev")
      writeVLong(out, v - prev)
      prev = v
      i += 1
    }
    out.toByteArray
  }

  /** Encode one posting's token-position list: varbyte count, then
    * delta+varbyte positions (strictly increasing token indices).
    */
  def encodePositions(positions: Array[Int]): Array[Byte] = {
    val out = new ByteArrayOutputStream(positions.length + 2)
    writeVLong(out, positions.length.toLong)
    var prev = 0L
    var i = 0
    while (i < positions.length) {
      writeVLong(out, positions(i).toLong - prev)
      prev = positions(i).toLong
      i += 1
    }
    out.toByteArray
  }

  /** Decode the position lists of `n` postings concatenated in
    * `bytes` (the block layout): returns one sorted array per posting.
    */
  def decodePositionsBlock(bytes: Array[Byte], n: Int): Array[Array[Int]] = {
    val out = new Array[Array[Int]](n)
    var bi = 0
    def readV(): Long = {
      var v = 0L
      var shift = 0
      var b = bytes(bi)
      bi += 1
      while ((b & 0x80) != 0) {
        v |= (b & 0x7fL) << shift
        shift += 7
        b = bytes(bi)
        bi += 1
      }
      v | ((b & 0x7fL) << shift)
    }
    var i = 0
    while (i < n) {
      val c = readV().toInt
      val ps = new Array[Int](c)
      var prev = 0L
      var j = 0
      while (j < c) { prev += readV(); ps(j) = prev.toInt; j += 1 }
      out(i) = ps
      i += 1
    }
    out
  }

  /** Inverse of [[encodeDeltas]]. */
  def decodeDeltas(bytes: Array[Byte], n: Int, base: Long): Array[Long] = {
    val gaps = decodeVarByte(bytes, n)
    var prev = base
    var i = 0
    while (i < n) {
      prev += gaps(i)
      gaps(i) = prev
      i += 1
    }
    gaps
  }
}
