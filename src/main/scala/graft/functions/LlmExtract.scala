package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** X2 (ref: lecture11/assignment/dags/weather_ollama_dag.py:54-110): the
  * LLM-in-the-pipeline pattern — structured extraction with a fixed JSON
  * contract, validated fail-fast (F10), with a mock mode for tests/offline
  * environments (the reference's MOCK_OLLAMA switch, :59-70).
  *
  * Execution shape: `mapPartitions` with one client per partition (pooled
  * connection in the real impl), so N executor partitions drive N
  * concurrent LLM streams and no client/state is serialized per row.
  * Parsing is `from_json` in FAILFAST-equivalent form: missing keys are
  * surfaced by the validation stage, not silently nulled.
  */
trait LlmClient extends Serializable {
  /** One chat completion constrained to JSON output. */
  def completeJson(systemPrompt: String, userPrompt: String): String
}

/** Deterministic mock (the tested path in the zero-egress environment):
  * echoes fields parsed from `key=value` pairs in the prompt and derives
  * numerics from a stable hash — same prompt, same JSON, every time. */
final class MockLlmClient extends LlmClient {
  def completeJson(systemPrompt: String, userPrompt: String): String = {
    val kv = userPrompt.split(";").flatMap { p =>
      p.split("=", 2) match { case Array(k, v) => Some(k.trim -> v.trim); case _ => None }
    }.toMap
    val h = math.abs(userPrompt.hashCode.toLong)
    val t = (h % 350) / 10.0 - 10.0
    s"""{"city_label": "${kv.getOrElse("city", "unknown")}",
       | "observation_date": "${kv.getOrElse("date", "1970-01-01")}",
       | "temp_c_current": $t,
       | "temp_c_max": ${t + 3.5},
       | "temp_c_min": ${t - 4.5},
       | "conditions_short": "${if (h % 2 == 0) "clear" else "cloudy"}",
       | "precipitation_mm": ${(h % 100) / 10.0}}""".stripMargin
  }
}

/** A broken mock for exercising the fail-fast contract path. */
final class MissingKeyLlmClient extends LlmClient {
  def completeJson(systemPrompt: String, userPrompt: String): String =
    """{"city_label": "x"}"""
}

object LlmExtract {

  /** The reference's 7-key structured contract
    * (weather_ollama_dag.py:115-124). */
  val weatherSchema: StructType = StructType(Seq(
    StructField("city_label", StringType),
    StructField("observation_date", StringType),
    StructField("temp_c_current", DoubleType),
    StructField("temp_c_max", DoubleType),
    StructField("temp_c_min", DoubleType),
    StructField("conditions_short", StringType),
    StructField("precipitation_mm", DoubleType)))

  val weatherSystemPrompt: String =
    "Extract the weather observation as JSON with exactly the required keys."

  /** Run the LLM over `promptCol` (one call per row, client per
    * partition), parse with the strict schema, and flatten the struct.
    * `validate=true` reproduces the reference's fail-fast key check. */
  def extract(df: DataFrame, idCol: String, promptCol: String,
              clientFactory: () => LlmClient, schema: StructType,
              systemPrompt: String, validate: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val raw: Dataset[(Long, String)] =
      df.select(col(idCol).cast("long"), col(promptCol)).as[(Long, String)]
        .mapPartitions { it =>
          val client = clientFactory()
          it.map { case (id, prompt) =>
            (id, client.completeJson(systemPrompt, prompt))
          }
        }
    val parsed = raw.toDF(idCol, "raw_json")
      .withColumn("parsed", from_json(col("raw_json"), schema))
      .select((col(idCol) +: schema.fieldNames.toIndexedSeq.map(f => col(s"parsed.$f").as(f))): _*)
    if (validate)
      graft.operators.Cleaners.assertFields(parsed, schema.fieldNames.toSeq)
    else parsed
  }
}
