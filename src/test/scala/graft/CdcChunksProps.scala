package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String

/** Property suite for the content-defined chunker
  * ([[graft.functions.TextHashOps.cdcChunks]]) — the two invariants the
  * example-based specs can't sweep:
  *
  *  1. EXACT COVER: for any text, the chunk (start, len) spans tile the
  *     byte range [0, len) exactly — contiguous, gap-free, in order —
  *     and every chunk hash lies on the [0, P57) line.
  *  2. BOUNDARY LOCALITY (the rsync/LBFS guarantee): a boundary depends
  *     only on the k bytes before it, so two texts sharing a suffix cut
  *     that suffix IDENTICALLY past the first k bytes — whatever random
  *     edit produced the differing prefixes. This is the property that
  *     makes CDC dedup alignment-robust; fixed-size blocking fails it.
  *
  * Scalar-level (no Spark session): the kernel is a pure function, so the
  * sweep runs hundreds of cases in milliseconds.
  */
object CdcChunksProps extends Properties("cdcChunks") {

  private def chunks(text: String, k: Int, maskBits: Int): Vector[(Int, Int, Long)] = {
    val a = graft.functions.TextHashOps.cdcChunks(
      UTF8String.fromString(text), k, maskBits)
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 3)
      (r.getInt(0), r.getInt(1), r.getLong(2))
    }.toVector
  }

  private val P57 = graft.functions.TextHashOps.P57

  // byte-diverse text: mostly ASCII words plus multi-byte code points, so
  // byte positions and char positions genuinely diverge in some cases
  private val genChar: Gen[Char] = Gen.frequency(
    (20, Gen.alphaNumChar), (6, Gen.const(' ')), (2, Gen.const('\n')),
    (1, Gen.oneOf('é', 'ß', '中', 'λ')))
  private val genText: Gen[String] =
    Gen.chooseNum(0, 400).flatMap(n => Gen.stringOfN(n, genChar))
  private val genK: Gen[Int] = Gen.chooseNum(4, 16)
  private val genMask: Gen[Int] = Gen.chooseNum(1, 8)

  property("exact cover: chunks tile [0, byteLen) contiguously, hashes on [0, P57)") =
    forAll(genText, genK, genMask) { (text, k, maskBits) =>
      val cs = chunks(text, k, maskBits)
      val byteLen = text.getBytes("UTF-8").length
      if (byteLen == 0) cs.isEmpty
      else {
        val contiguous = cs.head._1 == 0 &&
          cs.sliding(2).forall {
            case Vector((s1, l1, _), (s2, _, _)) => s2 == s1 + l1
            case _ => true
          }
        val covers = cs.last._1 + cs.last._2 == byteLen
        val positive = cs.forall(_._2 >= 1)
        val online = cs.forall(c => c._3 >= 0L && c._3 < P57)
        contiguous && covers && positive && online
      }
    }

  property("determinism: same text, same chunks") =
    forAll(genText, genK, genMask) { (text, k, maskBits) =>
      chunks(text, k, maskBits) == chunks(text, k, maskBits)
    }

  property("boundary locality: shared suffix re-chunks identically past k bytes") =
    forAll(genText, genText,
      Gen.chooseNum(30, 400).flatMap(n => Gen.stringOfN(n, genChar)),
      genK, genMask) { (p1, p2, suffix, k, maskBits) =>
      // two texts with arbitrary differing prefixes (≈ any random edit at
      // the front) and a common suffix: every chunk that starts at least k
      // bytes into the shared suffix must agree in suffix coordinates —
      // same boundaries, same lengths, same hashes
      def suffixChunks(prefix: String): Vector[(Int, Int, Long)] = {
        val pLen = prefix.getBytes("UTF-8").length
        chunks(prefix + suffix, k, maskBits)
          .filter(c => c._1 - pLen >= k)        // start fully inside suffix,
          .map(c => (c._1 - pLen, c._2, c._3))  //   past the k-byte seam
      }
      suffixChunks(p1) == suffixChunks(p2)
    }
}
