package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.timeseries.Coreset

/** Property-style checks (seeded random instances) for the driver-side
  * numeric kernels.
  */
class PropertySpec extends AnyFunSuite {

  test("greedy coreset: distinct indices, correct size, valid range (100 random instances)") {
    val rnd = new Random(42)
    for (_ <- 1 to 100) {
      val n = 2 + rnd.nextInt(39)
      val pts = Array.fill(n)(Array.fill(3)(rnd.nextDouble() * 20 - 10))
      val k = math.max(1, n / 3)
      val sel = Coreset.greedy(pts, k)
      assert(sel.length === math.min(k, n))
      assert(sel.distinct.length === sel.length, "no duplicate selections")
      assert(sel.forall(i => i >= 0 && i < n))
    }
  }

  test("greedy coreset: cover radius shrinks as k grows") {
    val pts = Array.tabulate(30)(i => Array(i.toDouble, (i * 7 % 13).toDouble))
    def coverRadius(sel: Array[Int]): Double =
      pts.map(p => sel.map { s =>
        val dx = p(0) - pts(s)(0); val dy = p(1) - pts(s)(1)
        dx * dx + dy * dy
      }.min).max
    val r3 = coverRadius(Coreset.greedy(pts, 3))
    val r10 = coverRadius(Coreset.greedy(pts, 10))
    assert(r10 <= r3, s"radius must not grow with more centers: $r10 > $r3")
  }

  test("greedy coreset handles degenerate inputs") {
    assert(Coreset.greedy(Array.empty[Array[Double]], 5).isEmpty)
    assert(Coreset.greedy(Array(Array(1.0, 2.0)), 0).isEmpty)
    val dup = Array.fill(5)(Array(1.0, 1.0))
    val sel = Coreset.greedy(dup, 3)
    assert(sel.length === 3 && sel.distinct.length === 3)
  }
}
