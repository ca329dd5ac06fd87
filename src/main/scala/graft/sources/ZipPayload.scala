package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.ZipInputStream

import scala.collection.mutable

/** Shared driver-side zip extraction for the packaged single-file sources
  * (xlsx = zipped OOXML, shapefile = zipped shp/dbf/shx). Size-guarded:
  * these formats are definitionally small uploads (a zip member cannot be
  * split for parallel scan), so the guard protects the driver from
  * decompression bombs, and the distributed plan starts AFTER parsing. */
private[sources] object ZipPayload {

  val MaxUncompressedBytes: Long = 256L * 1024 * 1024

  /** entry name → bytes for every file entry; throws on non-zip payloads
    * (callers map to their format-error taxonomy). */
  def readAll(bytes: Array[Byte], guardLabel: String): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.Map.empty[String, Array[Byte]]
    var total = 0L
    var e = zin.getNextEntry
    if (e == null) throw new IllegalArgumentException("not a zip archive")
    while (e != null) {
      if (!e.isDirectory) {
        val buf = new ByteArrayOutputStream()
        val chunk = new Array[Byte](65536)
        var n = zin.read(chunk)
        while (n >= 0) {
          total += n
          require(total <= MaxUncompressedBytes, s"$guardLabel exceeds driver-side size guard")
          buf.write(chunk, 0, n)
          n = zin.read(chunk)
        }
        out(e.getName) = buf.toByteArray
      }
      e = zin.getNextEntry
    }
    out.toMap
  }
}
