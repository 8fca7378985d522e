package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Totality fuzzing of the byte-level media parsers: a 100 TB crawl WILL
  * contain truncated, corrupted, and adversarial payloads, and a parser
  * that throws inside `mapPartitions` kills the task (and with it the
  * stage retry budget) instead of degrading to the fingerprint fallback.
  * Every parser must be TOTAL — Some/None, never an exception — on
  * arbitrary bytes, on mutated valid media, and on truncations. Pure
  * JVM-side properties, no Spark session needed.
  */
class MediaFuzzSpec extends AnyFunSuite with Matchers {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(200)

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  private val arbitraryBytes: Gen[Array[Byte]] =
    Gen.choose(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  /** A valid payload with one byte overwritten at a random offset —
    * header fields, chunk sizes, and body bytes all get hit.
    */
  private def mutated(valid: Array[Byte]): Gen[Array[Byte]] = for {
    off <- Gen.choose(0, valid.length - 1)
    b <- Gen.choose(Byte.MinValue, Byte.MaxValue)
  } yield { val p = valid.clone(); p(off) = b; p }

  private val validWav: Gen[Array[Byte]] = for {
    seed <- Gen.choose(0L, 5000L)
    n <- Gen.choose(1, 11)
    perturb <- Gen.oneOf(true, false)
  } yield Multimodal.syntheticWavKeyed(seed, 64 * n, perturb)

  private val validBmp: Gen[Array[Byte]] = for {
    seed <- Gen.choose(0L, 5000L)
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 20)
    perturb <- Gen.oneOf(true, false)
  } yield Multimodal.syntheticBmpKeyed(seed, w, h, perturb)

  test("energyHashWav is total on arbitrary bytes") {
    check(Prop.forAll(arbitraryBytes) { p =>
      Multimodal.energyHashWav(p); true
    })
  }

  test("energyHashWav is total on one-byte-corrupted and truncated WAVs") {
    check(Prop.forAll(validWav.flatMap(mutated)) { p =>
      Multimodal.energyHashWav(p); true
    })
    check(Prop.forAll(for {
      v <- validWav; cut <- Gen.choose(0, v.length)
    } yield v.take(cut)) { p =>
      Multimodal.energyHashWav(p); true
    })
  }

  test("ahashBmp is total on arbitrary, corrupted, and truncated bytes") {
    check(Prop.forAll(arbitraryBytes) { p => Multimodal.ahashBmp(p); true })
    check(Prop.forAll(validBmp.flatMap(mutated)) { p =>
      Multimodal.ahashBmp(p); true
    })
    check(Prop.forAll(for {
      v <- validBmp; cut <- Gen.choose(0, v.length)
    } yield v.take(cut)) { p =>
      Multimodal.ahashBmp(p); true
    })
  }

  private val validAvi: Gen[Array[Byte]] = for {
    seed <- Gen.choose(0L, 5000L)
    w <- Gen.choose(1, 24)
    h <- Gen.choose(1, 12)
    nf <- Gen.choose(1, 4)
    perturb <- Gen.oneOf(true, false)
  } yield Multimodal.syntheticAviKeyed(seed, w, h, nf, perturb)

  test("frameHashesAvi is total on arbitrary, corrupted, and truncated bytes") {
    check(Prop.forAll(arbitraryBytes) { p =>
      Multimodal.frameHashesAvi(p); true
    })
    check(Prop.forAll(validAvi.flatMap(mutated)) { p =>
      Multimodal.frameHashesAvi(p); true
    })
    check(Prop.forAll(for {
      v <- validAvi; cut <- Gen.choose(0, v.length)
    } yield v.take(cut)) { p =>
      Multimodal.frameHashesAvi(p); true
    })
  }

  test("parseHeader is total on arbitrary bytes for both media kinds") {
    check(Prop.forAll(arbitraryBytes, Gen.oneOf("audio", "image", "video")) {
      (p, kind) => Multimodal.parseHeader(kind, p); true
    })
    check(Prop.forAll(validWav.flatMap(mutated)) { p =>
      Multimodal.parseHeader("audio", p); true
    })
  }

  test("resizeBmp is total on corrupted and truncated BMPs") {
    check(Prop.forAll(validBmp.flatMap(mutated)) { p =>
      Multimodal.resizeBmp(p, 8, 8); true
    })
    check(Prop.forAll(for {
      v <- validBmp; cut <- Gen.choose(0, v.length)
    } yield v.take(cut)) { p =>
      Multimodal.resizeBmp(p, 8, 8); true
    })
  }

  test("valid synthetic media always parse (the fallback never masks a regression)") {
    check(Prop.forAll(validWav)(p => Multimodal.energyHashWav(p).isDefined))
    check(Prop.forAll(validBmp)(p => Multimodal.ahashBmp(p).isDefined))
    check(Prop.forAll(validAvi)(p => Multimodal.frameHashesAvi(p).isDefined))
  }

  test("hashes are deterministic: equal bytes give equal fingerprints") {
    check(Prop.forAll(validWav) { p =>
      Multimodal.energyHashWav(p) == Multimodal.energyHashWav(p.clone())
    })
    check(Prop.forAll(validBmp) { p =>
      Multimodal.ahashBmp(p) == Multimodal.ahashBmp(p.clone())
    })
    check(Prop.forAll(validAvi) { p =>
      Multimodal.frameHashesAvi(p) == Multimodal.frameHashesAvi(p.clone())
    })
  }
}
