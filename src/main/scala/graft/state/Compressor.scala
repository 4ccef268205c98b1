package graft.state

import net.jpountz.lz4.LZ4Factory
import java.nio.ByteBuffer

/** State compression with the reference's behavior (reference
  * persistence/compression/Compressor.scala:27-96): payloads above a
  * threshold are LZ4-compressed with a small header; smaller payloads pass
  * through. Layout: [1-byte marker][4-byte original length][lz4 block] for
  * compressed, [0-marker][raw] for passthrough — a self-describing frame so
  * readers need no side channel.
  *
  * In the Spark engine the state store already compresses (RocksDB), so
  * this codec is for the EXTERNAL snapshot sink where bytes cross systems.
  */
final class Compressor(thresholdBytes: Int = 10000) {
  private val factory = LZ4Factory.fastestInstance()

  def compress(payload: Array[Byte]): Array[Byte] = {
    if (payload.length < thresholdBytes) {
      val out = new Array[Byte](payload.length + 1)
      out(0) = 0
      System.arraycopy(payload, 0, out, 1, payload.length)
      out
    } else {
      val compressor = factory.fastCompressor()
      val max = compressor.maxCompressedLength(payload.length)
      val buf = new Array[Byte](max)
      val n = compressor.compress(payload, 0, payload.length, buf, 0, max)
      val out = ByteBuffer.allocate(1 + 4 + n)
      out.put(1.toByte).putInt(payload.length).put(buf, 0, n)
      out.array()
    }
  }

  def decompress(frame: Array[Byte]): Array[Byte] = Compressor.decodeFrame(frame)
}

object Compressor {
  private val factory = LZ4Factory.fastestInstance()

  /** Static frame decode — the body `graft.functions.FrameDecode`'s
    * generated code calls, so the snapshot read path decodes inside
    * whole-stage codegen instead of an interpreted row loop. */
  def decodeFrame(frame: Array[Byte]): Array[Byte] = {
    require(frame.nonEmpty, "empty frame")
    frame(0) match {
      case 0 => java.util.Arrays.copyOfRange(frame, 1, frame.length)
      case 1 =>
        val bb = ByteBuffer.wrap(frame, 1, frame.length - 1)
        val origLen = bb.getInt
        val out = new Array[Byte](origLen)
        factory.fastDecompressor().decompress(frame, 5, out, 0, origLen)
        out
      case m => throw new IllegalArgumentException(s"unknown frame marker $m")
    }
  }
}
