package graft.multimodal

/** The documented toy media container format ("GRFT"), the offline
  * stand-in for a real image/audio/video container (reference stores
  * media payloads as opaque Avro `bytes`, src/storage/avro_reader.rs —
  * it never looks inside; this engine's decode seam does, and with no
  * media libs in the container the header it parses is this one).
  *
  * Byte layout (big-endian, 14-byte header):
  * {{{
  *   0..3    magic 'G' 'R' 'F' 'T'
  *   4       version        (= 1)
  *   5       media kind     (1 = image, 2 = audio, 3 = video)
  *   6..7    width,  u16 BE
  *   8..9    height, u16 BE
  *   10..13  payload byte length, u32 BE
  *   14..    payload bytes
  * }}}
  *
  * `parse` is strict — wrong magic, unknown version/kind, or a declared
  * payload length that disagrees with the actual byte count all reject
  * the header (the decode stage then falls back to opaque-blob
  * metadata), so a corrupted object degrades instead of mis-decoding.
  */
object ToyMedia {
  val HeaderLen: Int = 14
  private val Magic: Array[Byte] = "GRFT".getBytes("US-ASCII")

  def wrap(kind: Int, width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    require(kind >= 1 && kind <= 3, s"kind: $kind")
    require(width >= 0 && width <= 0xffff && height >= 0 && height <= 0xffff,
      s"dims: ${width}x$height")
    val out = new Array[Byte](HeaderLen + payload.length)
    System.arraycopy(Magic, 0, out, 0, 4)
    out(4) = 1
    out(5) = kind.toByte
    out(6) = (width >> 8).toByte; out(7) = width.toByte
    out(8) = (height >> 8).toByte; out(9) = height.toByte
    val n = payload.length
    out(10) = (n >>> 24).toByte; out(11) = (n >>> 16).toByte
    out(12) = (n >>> 8).toByte; out(13) = n.toByte
    System.arraycopy(payload, 0, out, HeaderLen, n)
    out
  }

  /** `Some((kind, width, height, payloadLen))` for a valid header. */
  def parse(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (bytes.length < HeaderLen) return None
    var i = 0
    while (i < 4) { if (bytes(i) != Magic(i)) return None; i += 1 }
    if (bytes(4) != 1) return None
    val kind = bytes(5) & 0xff
    if (kind < 1 || kind > 3) return None
    val w = ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
    val h = ((bytes(8) & 0xff) << 8) | (bytes(9) & 0xff)
    val np = ((bytes(10) & 0xff) << 24) | ((bytes(11) & 0xff) << 16) |
      ((bytes(12) & 0xff) << 8) | (bytes(13) & 0xff)
    if (np != bytes.length - HeaderLen) return None
    Some((kind, w, h, np))
  }
}
