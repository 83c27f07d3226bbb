package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench registry's probe surface: every headline entry resolvable
  * by name (tools time single entries in isolation through it), and
  * unknown names fail loudly. */
class BenchEntrySpec extends AnyFunSuite {
  test("entryFor resolves every headline entry and rejects unknowns") {
    // headline-phase entries (the indexed phase times its own builds
    // inline and is not name-addressable)
    Seq("b1_box_range", "b4x_intersects_join", "b4p_polygon_join",
      "b4sts_spatiotemporal_skew", "b5_knn_join_grid").foreach { n =>
      assert(Bench.entryFor(n) != null, n)
    }
    val e = intercept[IllegalArgumentException] {
      Bench.entryFor("no_such_entry")
    }
    assert(e.getMessage.contains("no_such_entry"))
  }
}
