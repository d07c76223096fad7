package graft

import org.scalatest.funsuite.AnyFunSuite

class ApiSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val sig = core.Signal.long(spark, sf)

  test("facade mirrors the reference call shapes end to end") {
    assert(Api.Kaiser(10, 20, 100).apply(sig).count() > 0)
    assert(Api.Hamming(10, 20, 100).apply(sig, mode = "valid").count() > 0)
    assert(Api.Butter(10, 20, 100).apply(sig, dephase = true).count() > 0)
    assert(Api.Ellip(10, 20, 100).order == 4)
    assert(Api.downsample(sig, 2, 100).count() > 0)
    assert(Api.psd(sig).count() > 0)
    assert(Api.plv(sig).count() == 10)
  }

  test("facade designs equal the operator-layer designs") {
    assert(Api.Kaiser(10, 20, 100).coeffs.sameElements(operators.FirOps.kaiserLp))
    assert(Api.Butter(10, 20, 100).sos.map(_.toSeq).toSeq ==
      operators.IirOps.butterLp.map(_.toSeq).toSeq)
  }
}
