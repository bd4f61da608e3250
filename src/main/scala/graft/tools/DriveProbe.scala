package graft.tools

import org.apache.spark.sql.SparkSession
import graft.datasets.Datasets
import graft.io.PlanJson
import graft.spec._

/** Error-path probes for the feature modules. */
object DriveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def prob(name: String)(f: => Any): Unit = {
      val r = try s"NO-ERROR: ${String.valueOf(f).take(60)}" catch {
        case e: SpecError => "SpecError: " + e.message.take(90)
        case e: Throwable => e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(90)
      }
      println(s"PROBE $name -> $r")
    }

    prob("json-missing-rows") {
      PlanJson.loadJson("""{"tables":[{"name":"t","columns":[]}]}""")
    }
    prob("json-unknown-strategy") {
      PlanJson.loadJson("""{"tables":[{"name":"t","rows":5,"columns":[
        {"name":"x","gen":{"strategy":"quantum"}}]}]}""")
    }
    prob("json-composite-pk") {
      PlanJson.loadJson("""{"tables":[{"name":"t","rows":5,
        "primary_key":{"columns":["a","b"]},"columns":[]}]}""")
    }
    prob("json-weighted-missing-weight") {
      PlanJson.loadJson("""{"tables":[{"name":"t","rows":5,"columns":[
        {"name":"x","gen":{"strategy":"values","values":["a","b"],
        "distribution":{"type":"weighted","weights":{"a":0.5}}}}]}]}""")
    }
    prob("unknown-dataset") { Datasets("basic/unknown") }
    prob("dataset-bad-option") {
      Datasets("basic/geometries").get(spark, 10, options = Map("geometryType" -> "blob"))
    }
    prob("yaml-garbage") { PlanJson.loadYaml("not: [valid: plan") }

    spark.stop()
  }
}
