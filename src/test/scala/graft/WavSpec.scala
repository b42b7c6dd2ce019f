package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Pins the r14 lock-free WAV fast path to the JDK audio stack it
  * replaces in the hot loops: the canonical writer must emit
  * byte-identical files to `AudioSystem.write`, and the strict parser
  * must recover exactly what `AudioSystem.getAudioInputStream` decodes
  * (the fast path's miss cases fall back to AudioSystem at runtime, so
  * agreement on canonical files is the whole contract).
  */
class WavSpec extends AnyFunSuite {

  private def audioSystemWav(pcm: Array[Byte], rate: Float): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2L)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  private def pcmOf(n: Int, seed: Long): Array[Byte] = {
    val pcm = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val s = Multimodal.audioSample(seed, i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    pcm
  }

  test("writeWavPcm16Mono is byte-identical to AudioSystem.write") {
    for ((n, seed) <- Seq((0, 1L), (1, 2L), (256, 3L), (767, 17L))) {
      val pcm = pcmOf(n, seed)
      val ours = Multimodal.writeWavPcm16Mono(pcm, 8000)
      val jdk = audioSystemWav(pcm, 8000f)
      assert(ours.length == jdk.length, s"length mismatch at n=$n")
      assert(java.util.Arrays.equals(ours, jdk), s"byte mismatch at n=$n")
    }
  }

  test("fast-path parse agrees with AudioSystem on canonical WAVs") {
    val pcm = pcmOf(500, 9L)
    val wav = Multimodal.writeWavPcm16Mono(pcm, 8000)
    // decode via the production path (fast path first) and via the JDK
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val jdkBytes = ais.readAllBytes()
    assert(java.util.Arrays.equals(jdkBytes, pcm))
    assert(ais.getFormat.getSampleRate == 8000f)
    assert(ais.getFormat.getChannels == 1)
  }

  test("non-WAV and truncated content still behaves like the JDK path") {
    val spark = GraftSession.build("4")
    import spark.implicits._
    // text bytes (no RIFF), a truncated header, and a RIFF with a lying
    // data length must all decode to NULL stats — the fall-back path's
    // answer
    val good = Multimodal.writeWavPcm16Mono(pcmOf(64, 5L), 8000)
    val lying = good.clone()
    // declared data length beyond the file: strict parser must refuse,
    // AudioSystem fallback then decides (readAllBytes stops at EOF)
    val bb = java.nio.ByteBuffer.wrap(lying)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, Int.MaxValue - 100)
    val rows = Multimodal.decodeAudioFeatures(
      Seq(
        (1L, "not audio at all".getBytes("UTF-8")),
        (2L, good.take(20)),
        (3L, good)).toDF("doc_id", "content")
        .selectExpr("doc_id", "content",
          "named_struct('mime', 'audio/wav', 'n_bytes', CAST(length(content) AS LONG)) AS meta"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).isNullAt(1) && rows(2L).isNullAt(1))
    assert(!rows(3L).isNullAt(1) && rows(3L).getLong(3) == 64L)
  }
}
