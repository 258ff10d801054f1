package graft

import graft.preprocess.Viod
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property-style VIOD spec — generalizes the reference's statistical
  * tests across distribution families, sample sizes, and scale/shift
  * transformations via a deterministic parameter grid (the repo has no
  * scalatest↔scalacheck bridge; determinism beats shrinkage here). */
class ViodPropertySpec extends AnyFunSuite {

  private def draws(seed: Long, n: Int,
      family: Int, scale: Double, shift: Double): Array[Double] = {
    val r = new Random(seed)
    Array.fill(n)(family match {
      case 0 => r.nextGaussian() * scale + shift
      case 1 => math.exp(r.nextGaussian()) * scale + shift
      case _ => -math.log(r.nextDouble()) * scale + shift
    })
  }

  test("clean draws from any family/scale/shift flag under 3% outliers") {
    for {
      (seed, n) <- Seq((1L, 500), (2L, 1500), (3L, 3000))
      family <- 0 to 2
      (scale, shift) <- Seq((1.0, 0.0), (50.0, -300.0), (0.2, 1000.0))
    } {
      val xs = draws(seed, n, family, scale, shift)
      val t = Viod.fitArray(xs)
      val frac = xs.count(v => !t.isInlier(v)).toDouble / n
      assert(frac < 0.03,
        s"family=$family n=$n scale=$scale shift=$shift: flagged $frac")
    }
  }

  test("a planted extreme point is always flagged") {
    for (seed <- 1L to 15L; n <- Seq(500, 2000)) {
      val clean = draws(seed, n, 0, 1.0, 0.0)
      val planted = 1000.0
      val t = Viod.fitArray(clean :+ planted)
      assert(!t.isInlier(planted), s"seed=$seed n=$n")
    }
  }

  test("flagging is translation-equivariant") {
    for (seed <- 1L to 10L; shift <- Seq(-500.0, 3.5, 250.0)) {
      val xs = draws(seed, 1000, 0, 1.0, 0.0)
      val t0 = Viod.fitArray(xs)
      val t1 = Viod.fitArray(xs.map(_ + shift))
      val f0 = xs.map(v => t0.isInlier(v)).toSeq
      val f1 = xs.map(v => t1.isInlier(v + shift)).toSeq
      assert(f0 == f1, s"seed=$seed shift=$shift")
    }
  }
}
