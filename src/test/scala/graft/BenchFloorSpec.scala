package graft

import org.scalatest.funsuite.AnyFunSuite

/** The self-maintaining bench calibration floor: the drift guard's
  * floor is the tightest of the compiled-in seed and every
  * `calibration_floor_next` the BENCH_r*.json artifact chain carries —
  * a faster box tightens it with no hand edit, and unreadable or
  * pre-chain artifacts degrade to the seed instead of failing.
  */
class BenchFloorSpec extends AnyFunSuite {

  private def tmp(name: String, body: String): java.io.File = {
    val f = java.io.File.createTempFile(name, ".json")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, body.getBytes("UTF-8"))
    f
  }

  test("floorNextIn parses the chain field and degrades on its absence or garbage") {
    assert(Bench.floorNextIn(tmp("with",
      """{"ok":true,"calibration_floor_next":1.234,"x":1}""")) ===
      Some(1.234))
    assert(Bench.floorNextIn(tmp("spaced",
      """{"calibration_floor_next" : 0.987}""")) === Some(0.987))
    // pre-chain artifact (rounds 1-11): no field -> no contribution
    assert(Bench.floorNextIn(tmp("without",
      """{"ok":true,"calibration":4.9,"calibration_floor":1.396}""")) ===
      None)
    assert(Bench.floorNextIn(tmp("garbage", "not json at all")) === None)
    // non-positive floors are poisoned artifacts, not tighter floors
    assert(Bench.floorNextIn(tmp("zero",
      """{"calibration_floor_next":0.0}""")) === None)
    assert(Bench.floorNextIn(
      new java.io.File("/nonexistent/never.json")) === None)
  }

  test("the effective floor never exceeds the seed (chain entries only tighten)") {
    // the repo's artifact chain may or may not carry floors yet;
    // either way the effective floor is bounded by the 1.396 s seed
    assert(Bench.calibrationFloor <= 1.396)
    assert(Bench.calibrationFloor > 0)
  }
}
