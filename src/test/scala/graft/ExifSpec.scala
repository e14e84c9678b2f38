package graft

import graft.extract.{Exif, ImageExtractor, RawDoc}
import org.scalatest.funsuite.AnyFunSuite

class ExifSpec extends AnyFunSuite {
  test("tiff ifd roundtrip: make/model/datetime") {
    val tiff = Exif.writeTiff("GraftCam", "Model X100", "2019:07:04 12:30:01")
    val m = Exif.read(tiff)
    assert(m.make == Some("GraftCam"))
    assert(m.model == Some("Model X100"))
    assert(m.dateTimeOriginal == Some("2019:07:04 12:30:01"))
  }

  test("image extractor maps exif to generator/authoredAt (image.py:38-58)") {
    val tiff = Exif.writeTiff("GraftCam", "X1", "2019:07:04 12:30:01")
    val res = ImageExtractor.extract(RawDoc("t", "p.tif", "image/tiff", tiff))
    // tif routes to TIFFIngestor in dispatch; call extractor directly here
    assert(res.properties("generator") == Seq("GraftCam", "X1"))
    assert(res.properties("authoredAt") == Seq("2019-07-04T12:30:01"))
    assert(res.spans.map(_.kind) == Vector("image"))
  }

  test("jpeg without exif and garbage are safe") {
    assert(Exif.read(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte,
      0xda.toByte, 0, 2)) == Exif.Empty)
    assert(Exif.read("not an image".getBytes) == Exif.Empty)
  }
}
