package graft.tools

import graft.io.PlanJson

/** Scratch check: plan (de)serialization roundtrip on the reference fixtures. */
object DriveRoundtrip {
  def main(args: Array[String]): Unit = {
    for (path <- Seq("/root/reference/tests/core/fixtures/star_schema.json",
                     "/root/reference/tests/core/fixtures/plan.json",
                     "/root/reference/tests/core/fixtures/plan.yml")) {
      val plan = PlanJson.loadFile(path)
      val viaJson = PlanJson.loadJson(PlanJson.saveJson(plan))
      val viaYaml = PlanJson.loadYaml(PlanJson.saveYaml(plan))
      println(s"CHECK $path json=${viaJson == plan} yaml=${viaYaml == plan}")
      if (viaJson != plan) {
        plan.tables.zip(viaJson.tables).foreach { case (a, b) =>
          if (a != b) a.columns.zip(b.columns).foreach { case (ca, cb) =>
            if (ca != cb) println(s"  DIFF json ${a.name}: $ca\n            vs $cb")
          }
        }
      }
      if (viaYaml != plan) {
        plan.tables.zip(viaYaml.tables).foreach { case (a, b) =>
          if (a != b) a.columns.zip(b.columns).foreach { case (ca, cb) =>
            if (ca != cb) println(s"  DIFF yaml ${a.name}: $ca\n            vs $cb")
          }
        }
      }
    }
  }
}
