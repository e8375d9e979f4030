package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}

/** The Puffin sidecar-file format (Apache Iceberg's "Puffin spec" —
  * puffin-spec.md), the container Iceberg v3 stores DELETION VECTORS
  * in. Layout:
  *
  * {{{
  *   Magic | blob bytes... | Magic | FooterPayload (JSON) |
  *   FooterPayloadSize (4B LE) | Flags (4B) | Magic
  * }}}
  *
  * Each `deletion-vector-v1` blob is itself framed (iceberg spec v3,
  * "Deletion vectors"): combined length of magic+vector as 4 bytes
  * BIG-endian, the 4-byte DV magic `D1 D3 39 64`, the 64-bit roaring
  * bitmap in portable serialization (the SAME wire format Delta DVs
  * use — [[DeletionVectors.Bitmap64]] — which is why UniForm can share
  * them), and a CRC-32 of magic+vector as 4 bytes big-endian.
  *
  * Readers of a DV blob need only (offset, size) from the delete
  * manifest entry — the footer exists so a snapshot-less tool can
  * inventory the blobs; both paths are implemented and spec-tested.
  */
object Puffin {

  import scala.jdk.CollectionConverters._

  private val mapper = new ObjectMapper()
  val Magic: Array[Byte] = Array('P'.toByte, 'F'.toByte, 'A'.toByte, '1'.toByte)
  val DvMagic: Array[Byte] =
    Array(0xD1.toByte, 0xD3.toByte, 0x39.toByte, 0x64.toByte)
  val DvBlobType = "deletion-vector-v1"

  /** One blob's placement + metadata as the footer records it. */
  final case class BlobRef(blobType: String, offset: Long, length: Long,
                           properties: Map[String, String])

  /** Frame a serialized 64-bit roaring bitmap as a deletion-vector-v1
    * blob: 4B BE length of (magic+vector) | DvMagic | vector | 4B BE
    * CRC-32 of (magic+vector).
    */
  def dvBlob(bitmap: Array[Byte]): Array[Byte] = {
    val body = DvMagic ++ bitmap
    val crc = new CRC32(); crc.update(body)
    ByteBuffer.allocate(4 + body.length + 4).order(ByteOrder.BIG_ENDIAN)
      .putInt(body.length).put(body).putInt(crc.getValue.toInt).array()
  }

  /** Unframe a deletion-vector-v1 blob back to the bitmap bytes,
    * verifying length, magic and CRC — a torn or mis-offset read must
    * fail loudly, never mask the wrong rows.
    */
  def dvBitmap(blob: Array[Byte]): Array[Byte] = {
    require(blob.length >= 12, s"DV blob too short: ${blob.length} bytes")
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.BIG_ENDIAN)
    val len = bb.getInt
    require(len == blob.length - 8,
      s"DV blob length field $len != framed ${blob.length - 8}")
    val body = new Array[Byte](len); bb.get(body)
    require(body.take(4).sameElements(DvMagic),
      "DV blob magic mismatch — not a deletion-vector-v1 blob")
    val crc = new CRC32(); crc.update(body)
    require(bb.getInt == crc.getValue.toInt, "DV blob CRC mismatch")
    body.drop(4)
  }

  /** Write a Puffin file of `blobs` (payload bytes + per-blob
    * properties), returning each blob's footer ref in order. Driver-side
    * I/O ∝ total blob bytes — DV bitmaps, kilobytes per file.
    */
  def write(f: FileSystem, path: Path,
            blobs: Seq[(Array[Byte], Map[String, String])],
            blobType: String = DvBlobType): Seq[BlobRef] = {
    val refs = Seq.newBuilder[BlobRef]
    val out = f.create(path, true)
    try {
      out.write(Magic)
      var offset = Magic.length.toLong
      val blobNodes = mapper.createArrayNode()
      blobs.foreach { case (bytes, props) =>
        out.write(bytes)
        val n = mapper.createObjectNode()
        n.put("type", blobType)
        n.putArray("fields") // DV blobs carry no field ids
        n.put("offset", offset)
        n.put("length", bytes.length.toLong)
        val p = n.putObject("properties")
        props.foreach { case (k, v) => p.put(k, v) }
        blobNodes.add(n)
        refs += BlobRef(blobType, offset, bytes.length.toLong, props)
        offset += bytes.length
      }
      val footer = mapper.createObjectNode()
      footer.set[com.fasterxml.jackson.databind.JsonNode]("blobs", blobNodes)
      val payload = mapper.writeValueAsBytes(footer)
      out.write(Magic)
      out.write(payload)
      val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(payload.length).putInt(0) // flags: none (uncompressed)
      out.write(tail.array())
      out.write(Magic)
    } finally out.close()
    refs.result()
  }

  /** Parse the footer's blob inventory (a snapshot-less tool's view —
    * manifest-driven readers use [[readBlob]] with the entry's
    * offset/size directly).
    */
  def footer(f: FileSystem, path: Path): Seq[BlobRef] = {
    val len = f.getFileStatus(path).getLen
    val in = f.open(path)
    try {
      val tail = new Array[Byte](12)
      in.readFully(len - 12, tail)
      val bb = ByteBuffer.wrap(tail).order(ByteOrder.LITTLE_ENDIAN)
      val payloadLen = bb.getInt
      val flags = bb.getInt
      require((flags & 1) == 0, s"$path: compressed Puffin footer unsupported")
      val magic = new Array[Byte](4); bb.get(magic)
      require(magic.sameElements(Magic), s"$path: not a Puffin file (tail)")
      val payload = new Array[Byte](payloadLen)
      in.readFully(len - 12 - payloadLen, payload)
      val node = mapper.readTree(payload)
      node.get("blobs").elements().asScala.map { b =>
        BlobRef(b.get("type").asText(), b.get("offset").asLong(),
          b.get("length").asLong(),
          Option(b.get("properties")).map(_.properties().iterator().asScala
            .map(e => e.getKey -> e.getValue.asText()).toMap)
            .getOrElse(Map.empty))
      }.toSeq
    } finally in.close()
  }

  /** Read one blob's raw bytes at (offset, size) — the manifest-driven
    * path the v3 read uses.
    */
  def readBlob(f: FileSystem, path: Path, offset: Long,
               size: Long): Array[Byte] = {
    // a corrupt manifest's placement triple must refuse loudly (the
    // same contract as dvBitmap's framing checks) — not surface as a
    // NegativeArraySizeException or an OOM-sized allocation
    val fileLen = f.getFileStatus(path).getLen
    // overflow-proof bound: `offset + size` wraps negative for a huge
    // corrupt offset — compare against `fileLen - size` instead
    require(size >= 0 && size <= Int.MaxValue && size <= fileLen &&
        offset >= 0 && offset <= fileLen - size,
      s"$path: blob range [offset=$offset, size=$size) exceeds file " +
        s"length $fileLen — corrupt manifest placement entry")
    val in = f.open(path)
    try {
      val bytes = new Array[Byte](size.toInt)
      in.readFully(offset, bytes)
      bytes
    } finally in.close()
  }
}
