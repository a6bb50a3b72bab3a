package graft.rules

import java.util.concurrent.{ConcurrentHashMap, LinkedBlockingQueue}

import org.apache.spark.sql.DataFrame
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Named trial rules (reference internal/trial): POST /ruletest
  * registers a trial (stopping a previous run under the same id, like
  * the reference's CreateRule), POST /ruletest/{id}/start runs it and
  * pushes each output row to the trial's feed, and the REST server
  * streams that feed as server-sent events at GET /test/{id} — the
  * reference's sink endpoint, same path.
  *
  * `mockSource` replaces the DATA of an existing stream for the trial
  * plan only: {"stream": {"data": [{...}, ...]}} (the stream still
  * provides the schema; the reference's interval/loop pacing knobs
  * don't apply to a bounded batch trial and are ignored).
  *
  * Output is capped at 1000 rows per run — a trial is a sample, not a
  * pipeline. The feed is single-consumer per run.
  */
final class TrialManager(engine: RuleEngine) {

  final class Trial(val id: String, df: DataFrame) {
    val feed = new LinkedBlockingQueue[String]()
    @volatile var done = false
    private[TrialManager] def run(): Unit = {
      try df.toJSON.take(1000).foreach(feed.put)
      catch { case e: Exception => feed.put(s"""{"error":${JsonMethods.compact(JString(String.valueOf(e.getMessage)))}}""") }
      finally done = true
    }
  }

  private val runs = new ConcurrentHashMap[String, Trial]()

  /** Register (re-register stops the previous run); returns the id and
    * an eager 10-row sample proving the plan compiles.
    */
  def create(id: String, sql: String, mock: JValue): Seq[String] = {
    val overrides: Map[String, DataFrame] = mock match {
      case JObject(fs) => fs.map { case JField(stream, cfg) =>
        val rows = (cfg \ "data") match {
          case JArray(xs) => xs.map(x => JsonMethods.compact(JsonMethods.render(x)))
          case _ => Nil
        }
        val schema = engine.catalog.get(stream).map(_.schema)
          .getOrElse(throw new NoSuchElementException(s"mocked stream $stream not found"))
        val ds = engine.session.createDataset(rows)(
          org.apache.spark.sql.Encoders.STRING)
        val reader = engine.session.read
        val df =
          if (schema.nonEmpty) reader.schema(schema).json(ds)
          else reader.json(ds)
        stream -> df
      }.toMap
      case _ => Map.empty
    }
    val df = engine.compileSql(sql, overrides)
    val sample = df.toJSON.take(10).toSeq
    Option(runs.put(id, new Trial(id, df))).foreach(_.done = true)
    sample
  }

  def start(id: String): Unit = {
    val t = Option(runs.get(id)).getOrElse(
      throw new NoSuchElementException(s"trial rule $id not found"))
    val th = new Thread(() => t.run(), s"trial-$id")
    th.setDaemon(true)
    th.start()
  }

  def stop(id: String): Unit =
    Option(runs.remove(id)).foreach(_.done = true)

  def get(id: String): Option[Trial] = Option(runs.get(id))
}
