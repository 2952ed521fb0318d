package graft.tiling

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import graft.SparkSpec

/** TorchExport against the stub-torch unpickler (scripts/check_pth.py):
  * the checker replays exactly the protocol torch.load implements —
  * find_class of the torch globals, persistent_load of storage tuples,
  * _rebuild_tensor_v2 — and byte-compares each storage against md5s
  * computed here, so the .pth contract is validated end-to-end without
  * torch in the container. */
class TorchExportSpec extends SparkSpec {
  import spark.implicits._

  private def md5LE(a: Array[Float]): String = {
    val bb = ByteBuffer.allocate(a.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    a.foreach(bb.putFloat)
    MessageDigest.getInstance("MD5").digest(bb.array())
      .map("%02x".format(_)).mkString
  }

  private def runChecker(pth: String, expected: String): Int = {
    import scala.sys.process._
    Seq("python3", "scripts/check_pth.py", pth, expected).!
  }

  test("writePth: stub-torch unpickler accepts the archive, storages byte-exact") {
    val dir = tempDir("pth")
    val t0 = Array.tabulate(2 * 3 * 4 * 4)(i => i * 0.5f - 7f)
    val t1 = Array.tabulate(2 * 3 * 8 * 8)(i => (i % 113) * 0.25f)
    val pth = dir.resolve("ds.pth").toString
    TorchExport.writePth(pth, Seq(
      (t0, Seq(2, 3, 4, 4)), (t1, Seq(2, 3, 8, 8))))
    val expected = dir.resolve("expected.json")
    Files.writeString(expected,
      s"""{"tensors": [
         |  {"shape": [2, 3, 4, 4], "md5": "${md5LE(t0)}"},
         |  {"shape": [2, 3, 8, 8], "md5": "${md5LE(t1)}"}]}""".stripMargin)
    assert(runChecker(pth, expected.toString) == 0,
      "stub-torch checker rejected the archive")
  }

  test("writeTileDatasetPth: reference artifact shape from engine tiles") {
    val dir = tempDir("pth2")
    val batch = 6; val scale = 3; val nBands = 2
    val lrEdge = batch / scale
    def tile(pid: String, tid: Int, seed: Int) = TileRow(
      pid, tid, 10, 10,
      Array.tabulate(nBands * batch * batch)(i => (seed * 100 + i).toFloat),
      Array.tabulate(nBands * lrEdge * lrEdge)(i => (seed * 10 + i).toFloat),
      batch, scale)
    // deliberately unordered input: the export must impose the reference's
    // (pair_id, tile_id) concat order
    val tiles = Seq(tile("p2", 0, 3), tile("p1", 1, 2), tile("p1", 0, 1))
    val pth = dir.resolve("tiles.pth").toString
    val n = TorchExport.writeTileDatasetPth(tiles.toDS(), pth, nBands)
    assert(n == 3)
    val ordered = tiles.sortBy(t => (t.pair_id, t.tile_id))
    val lr = ordered.flatMap(_.lr).toArray
    val hr = ordered.flatMap(_.hr).toArray
    val expected = dir.resolve("expected.json")
    Files.writeString(expected,
      s"""{"tensors": [
         |  {"shape": [3, $nBands, $lrEdge, $lrEdge], "md5": "${md5LE(lr)}"},
         |  {"shape": [3, $nBands, $batch, $batch], "md5": "${md5LE(hr)}"}]}""".stripMargin)
    assert(runChecker(pth, expected.toString) == 0,
      "stub-torch checker rejected the tile dataset")
  }

  test("writePth: over-ceiling export fails loudly naming the Parquet path") {
    val err = intercept[IllegalArgumentException] {
      TorchExport.writePth("/tmp/never.pth",
        Seq((Array.ofDim[Float](1024), Seq(1024))), maxBytes = 1024)
    }
    assert(err.getMessage.contains("Parquet"), err.getMessage)
    val err2 = intercept[IllegalArgumentException] {
      TorchExport.writePth("/tmp/never2.pth", Seq((Array.ofDim[Float](1), Seq(2))))
    }
    assert(err2.getMessage.contains("data length"))
  }
}
