package graft.rules

/** Named connection registry (reference: pkg/connection named
  * connections + the /connections REST surface): a connection is an
  * id + transport type + props, defined once and referenced from
  * stream/sink definitions (DDL `CONNECTION="id"` merges its props
  * under the stream's own, which win — the reference's confKey
  * layering). Status is a REAL probe: ping() dials the transport with
  * graft's own clients.
  */
object Connections {

  final case class Conn(id: String, typ: String, props: Map[String, String])

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Conn]()

  def register(c: Conn): Unit = {
    require(c.id.matches("[A-Za-z_][A-Za-z0-9_-]*"), s"invalid connection id ${c.id}")
    registry.put(c.id, c)
  }
  def get(id: String): Option[Conn] = Option(registry.get(id))
  def drop(id: String): Unit = registry.remove(id)
  def list: Seq[Conn] = {
    import scala.jdk.CollectionConverters._
    registry.values().asScala.toSeq.sortBy(_.id)
  }

  /** Merge a referenced connection's props under `own` (own wins). A
    * CONNECTION id that isn't registered FAILS the DDL — a silent
    * fall-through would run the stream against the stub feed and
    * "work" while receiving nothing.
    */
  def resolve(own: Map[String, String]): Map[String, String] =
    own.get("connection") match {
      case Some(id) =>
        val c = get(id).getOrElse(throw new IllegalArgumentException(
          s"connection '$id' is not registered"))
        c.props ++ own
      case None => own
    }

  /** Live status probe: dials the connection's transport and reports
    * "connected" or the failure (the reference pings through each
    * connector's Ping, internal/server/connection.go status field).
    */
  def ping(id: String): Either[String, String] = get(id) match {
    case None => Left(s"connection $id not found")
    case Some(c) =>
      val server = c.props.getOrElse("server",
        c.props.getOrElse("dburl", c.props.getOrElse("addr", "")))
      try {
        c.typ match {
          case "mqtt" =>
            val cl = graft.net.MqttClient.connect(server, s"graft-ping-$id",
              username = c.props.get("username"), password = c.props.get("password"),
              tls = graft.net.Tls.clientFromOptions(c.props))
            cl.close()
          case "redis" =>
            val cl = graft.net.RedisClient.connect(server,
              password = c.props.get("password"),
              tls = graft.net.Tls.clientFromOptions(c.props))
            cl.close()
          case "websocket" =>
            val cl = graft.net.WebSocketClient.connect(server,
              tls = graft.net.Tls.clientFromOptions(c.props))
            cl.close()
          case "kafka" =>
            val cl = graft.net.KafkaClient.connect(server, s"graft-ping-$id",
              tls = graft.net.Tls.clientFromOptions(c.props))
            cl.close()
          case "sql" =>
            graft.sources.SqlBridges.withConnection(server, c.props)(_.isValid(5))
          case "http" | "rest" | "http_pull" =>
            val conn = java.net.URI.create(server).toURL.openConnection()
              .asInstanceOf[java.net.HttpURLConnection]
            conn.setConnectTimeout(3000)
            conn.getResponseCode
            conn.disconnect()
          case "zmq" =>
            graft.net.ZmqSub.connect(server, "").close()
          case "neuron" =>
            graft.net.NngPair.dial(server).close()
          case other => return Left(s"no ping for connection type $other")
        }
        Right("connected")
      } catch { case e: Exception => Left(String.valueOf(e.getMessage)) }
  }
}
