package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** A REAL image codec, dependency-free: 24-bit uncompressed Windows BMP
  * (BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up BGR rows padded to 4
  * bytes). BMP's byte layout needs no compression library, so the decode /
  * feature-extract / resize kernels here are genuine implementations — the
  * piece of the multimodal pipeline that was previously stubbed. Formats
  * that require entropy coders (JPEG/PNG pixel data, audio codecs) remain
  * behind the same batch extension point
  * ([[Multimodal.decodeFeaturesPartitioned]]); their CONTAINER headers are
  * already parsed by [[Multimodal.parseMeta]].
  *
  * Layout written/read (little-endian, per the BMP specification):
  *   bytes 0-1   'B','M'            14-17  file size
  *   10-13  pixel data offset (54)  18-21  info header size (40)
  *   18-21/22-25 width/height (u32) 26-27  planes (1)   28-29  bpp (24)
  *   30-33  compression (0 = BI_RGB)
  * Pixel array: rows bottom-up, each row 3·w bytes zero-padded to 4-byte
  * multiples, channels in B,G,R order.
  */
object BmpCodec {

  /** decoded image: pixels TOP-DOWN row-major, 3 bytes (B,G,R) per pixel */
  final case class Bmp(width: Int, height: Int, pixels: Array[Byte])

  private def rowSize(w: Int): Int = ((w * 3 + 3) / 4) * 4

  /** encode top-down BGR pixels as a spec-conformant 24-bit BMP */
  def encode(img: Bmp): Array[Byte] = {
    require(img.pixels.length == img.width * img.height * 3,
      s"pixel buffer ${img.pixels.length} != ${img.width}x${img.height}x3")
    val rs = rowSize(img.width)
    val dataSize = rs * img.height
    val fileSize = 54 + dataSize
    val bb = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(fileSize).putInt(0).putInt(54)
    bb.putInt(40).putInt(img.width).putInt(img.height)
    bb.putShort(1).putShort(24)
    bb.putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
    bb.putInt(0).putInt(0)
    // rows bottom-up with per-row zero padding
    var y = img.height - 1
    while (y >= 0) {
      bb.put(img.pixels, y * img.width * 3, img.width * 3)
      var pad = rs - img.width * 3
      while (pad > 0) { bb.put(0: Byte); pad -= 1 }
      y -= 1
    }
    bb.array()
  }

  /** strict decode: None on wrong magic / unsupported variant / truncation
    * (a codec must never crash or mis-read on foreign bytes)
    */
  def decode(bytes: Array[Byte]): Option[Bmp] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = bb.getInt(10)
    decodeDib(bytes, 14, Some(dataOffset))
  }

  /** decode a headerless DIB (BITMAPINFOHEADER + bottom-up padded pixels)
    * starting at `off` — the form AVI '00db' video frames carry; the BMP
    * file decode above is this plus the 14-byte file header. `pixelsAt`
    * overrides the pixel offset when a file header declared one.
    */
  def decodeDib(bytes: Array[Byte], off: Int,
      pixelsAt: Option[Int] = None): Option[Bmp] = {
    if (off < 0 || off + 40 > bytes.length) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (bb.getInt(off) != 40) return None // BITMAPINFOHEADER only
    val w = bb.getInt(off + 4)
    val h = bb.getInt(off + 8)
    val planes = bb.getShort(off + 12)
    val bpp = bb.getShort(off + 14)
    val compression = bb.getInt(off + 16)
    if (planes != 1 || bpp != 24 || compression != 0) return None
    // bound so w·h·3 and row math stay in Int range (2^13 × 2^13 × 3 < 2^31):
    // a hostile header must not drive a negative-size allocation
    if (w <= 0 || h <= 0 || w > (1 << 13) || h > (1 << 13)) return None
    val dataOffset = pixelsAt.getOrElse(off + 40)
    val rs = rowSize(w)
    if (dataOffset < 0 || dataOffset.toLong + rs.toLong * h > bytes.length)
      return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      // stored bottom-up: file row y is image row (h-1-y)
      System.arraycopy(bytes, dataOffset + y * rs,
        out, (h - 1 - y) * w * 3, w * 3)
      y += 1
    }
    Some(Bmp(w, h, out))
  }

  /** encode just the DIB part (info header + bottom-up padded rows) —
    * what an AVI '00db' frame chunk carries
    */
  def encodeDib(img: Bmp): Array[Byte] = {
    val full = encode(img)
    java.util.Arrays.copyOfRange(full, 14, full.length)
  }

  /** exact per-channel byte sums (B, G, R) — the feature-extraction kernel
    * in integer space (sums, not means, so results are hash-exact)
    */
  def channelSums(img: Bmp): (Long, Long, Long) = {
    var b = 0L; var g = 0L; var r = 0L
    var i = 0
    while (i < img.pixels.length) {
      b += img.pixels(i) & 0xff
      g += img.pixels(i + 1) & 0xff
      r += img.pixels(i + 2) & 0xff
      i += 3
    }
    (b, g, r)
  }

  /** nearest-neighbor resample: target pixel (x2,y2) reads source pixel
    * (x2·w / w2, y2·h / h2) with truncating division — the standard
    * nearest-neighbor mapping, reproducible in closed form
    */
  def resizeNearest(img: Bmp, w2: Int, h2: Int): Bmp = {
    require(w2 > 0 && h2 > 0)
    val out = new Array[Byte](w2 * h2 * 3)
    var y2 = 0
    while (y2 < h2) {
      val sy = (y2.toLong * img.height / h2).toInt
      var x2 = 0
      while (x2 < w2) {
        val sx = (x2.toLong * img.width / w2).toInt
        System.arraycopy(img.pixels, (sy * img.width + sx) * 3,
          out, (y2 * w2 + x2) * 3, 3)
        x2 += 1
      }
      y2 += 1
    }
    Bmp(w2, h2, out)
  }
}
