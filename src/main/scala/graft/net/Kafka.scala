package graft.net

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.zip.CRC32C

/** Kafka wire protocol (the public Apache Kafka protocol spec),
  * dependency-free over JDK sockets — the extension-tier connector the
  * reference ships as a plugin (extensions/impl/kafka/source.go,
  * sink.go, wrapping segmentio/kafka-go).
  *
  * Scope, pinned to stable pre-flexible API versions: Produce v3 and
  * Fetch v4 carrying message-format-v2 record batches (zigzag-varint
  * records, CRC32C over the batch tail), ListOffsets v1 for
  * earliest/latest, SaslHandshake v1 + SaslAuthenticate v0 for SASL
  * PLAIN (the reference's saslAuthType=plain). Partitions are
  * addressed explicitly (the reference's `partition` prop);
  * consumer-group coordination (JoinGroup/SyncGroup/OffsetCommit) is
  * out of scope — graft tracks offsets in the fetch loop, the same
  * stance as the reference's default groupID-less reader.
  */
object Kafka {

  // api keys (protocol spec)
  final val ApiProduce = 0
  final val ApiFetch = 1
  final val ApiListOffsets = 2
  final val ApiSaslHandshake = 17
  final val ApiSaslAuthenticate = 36

  final case class Record(offset: Long, timestamp: Long,
                          key: Array[Byte], value: Array[Byte])

  // ---- primitive codecs ----

  def putString(out: DataOutputStream, s: String): Unit = {
    if (s == null) out.writeShort(-1)
    else {
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.writeShort(b.length); out.write(b)
    }
  }

  def readString(in: DataInputStream): String = {
    val n = in.readShort()
    if (n < 0) null
    else {
      val b = new Array[Byte](n); in.readFully(b)
      new String(b, StandardCharsets.UTF_8)
    }
  }

  def putBytes(out: DataOutputStream, b: Array[Byte]): Unit = {
    if (b == null) out.writeInt(-1)
    else { out.writeInt(b.length); out.write(b) }
  }

  def readBytes(in: DataInputStream): Array[Byte] = {
    val n = in.readInt()
    if (n < 0) null
    else { val b = new Array[Byte](n); in.readFully(b); b }
  }

  /** Zigzag varint/varlong (record fields, spec "Records" section). */
  def writeVarlong(buf: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = (v0 << 1) ^ (v0 >> 63)
    while ((v & ~0x7fL) != 0) { buf.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    buf.write(v.toInt)
  }

  def readVarlong(buf: ByteBuffer): Long = {
    var value = 0L
    var shift = 0
    var b = buf.get()
    while ((b & 0x80) != 0) {
      value |= (b & 0x7fL) << shift
      shift += 7
      b = buf.get()
    }
    value |= (b & 0x7fL) << shift
    (value >>> 1) ^ -(value & 1) // un-zigzag
  }

  // ---- record batches (message format v2) ----

  /** Encode one record batch: records get offsets base..base+n-1 and
    * timestampDelta 0 (the stub broker and tests are deterministic;
    * a real broker rewrites baseOffset on append anyway).
    */
  def encodeBatch(baseOffset: Long, firstTimestamp: Long,
                  records: Seq[(Array[Byte], Array[Byte])]): Array[Byte] = {
    require(records.nonEmpty, "kafka: empty record batch")
    val recBuf = new java.io.ByteArrayOutputStream()
    records.zipWithIndex.foreach { case ((key, value), i) =>
      val one = new java.io.ByteArrayOutputStream()
      one.write(0) // record attributes
      writeVarlong(one, 0L) // timestampDelta
      writeVarlong(one, i.toLong) // offsetDelta
      if (key == null) writeVarlong(one, -1L)
      else { writeVarlong(one, key.length.toLong); one.write(key) }
      if (value == null) writeVarlong(one, -1L)
      else { writeVarlong(one, value.length.toLong); one.write(value) }
      writeVarlong(one, 0L) // header count
      val body = one.toByteArray
      writeVarlong(recBuf, body.length.toLong)
      recBuf.write(body)
    }
    val recBytes = recBuf.toByteArray
    // tail = attributes..records — the CRC32C input
    val tail = ByteBuffer.allocate(2 + 4 + 8 + 8 + 8 + 2 + 4 + 4 + recBytes.length)
    tail.putShort(0) // attributes: no compression
    tail.putInt(records.size - 1) // lastOffsetDelta
    tail.putLong(firstTimestamp)
    tail.putLong(firstTimestamp) // maxTimestamp
    tail.putLong(-1L) // producerId
    tail.putShort(-1) // producerEpoch
    tail.putInt(-1) // baseSequence
    tail.putInt(records.size)
    tail.put(recBytes)
    val tailBytes = tail.array()
    val crc = new CRC32C()
    crc.update(tailBytes)
    // head: baseOffset, batchLength, partitionLeaderEpoch, magic, crc
    val batchLength = 4 + 1 + 4 + tailBytes.length // epoch+magic+crc+tail
    val out = ByteBuffer.allocate(8 + 4 + batchLength)
    out.putLong(baseOffset)
    out.putInt(batchLength)
    out.putInt(-1) // partitionLeaderEpoch
    out.put(2.toByte) // magic
    out.putInt(crc.getValue.toInt)
    out.put(tailBytes)
    out.array()
  }

  /** Decode every v2 batch in a record set, CRC-checked. */
  def decodeBatches(bytes: Array[Byte]): Seq[Record] = {
    if (bytes == null) return Seq.empty
    val buf = ByteBuffer.wrap(bytes)
    val out = scala.collection.mutable.ArrayBuffer[Record]()
    while (buf.remaining() >= 12) {
      val baseOffset = buf.getLong
      val batchLength = buf.getInt
      if (buf.remaining() < batchLength) return out.toSeq // truncated tail batch
      val batch = new Array[Byte](batchLength)
      buf.get(batch)
      val b = ByteBuffer.wrap(batch)
      b.getInt // partitionLeaderEpoch
      val magic = b.get()
      require(magic == 2, s"kafka: unsupported magic $magic (need message format v2)")
      val crcStored = b.getInt
      val tail = new Array[Byte](b.remaining())
      b.get(tail)
      val crc = new CRC32C()
      crc.update(tail)
      require(crc.getValue.toInt == crcStored, "kafka: record batch crc mismatch")
      val t = ByteBuffer.wrap(tail)
      val attributes = t.getShort
      require((attributes & 0x07) == 0, "kafka: compressed batches not supported")
      t.getInt // lastOffsetDelta
      val firstTimestamp = t.getLong
      t.getLong; t.getLong; t.getShort; t.getInt // maxTs, pid, pepoch, baseSeq
      val numRecords = t.getInt
      for (_ <- 0 until numRecords) {
        val len = readVarlong(t).toInt
        val end = t.position() + len
        t.get() // record attributes
        val tsDelta = readVarlong(t)
        val offDelta = readVarlong(t)
        val keyLen = readVarlong(t).toInt
        val key = if (keyLen < 0) null else { val k = new Array[Byte](keyLen); t.get(k); k }
        val valLen = readVarlong(t).toInt
        val value = if (valLen < 0) null else { val v = new Array[Byte](valLen); t.get(v); v }
        out += Record(baseOffset + offDelta, firstTimestamp + tsDelta, key, value)
        t.position(end) // skip headers
      }
    }
    out.toSeq
  }

  /** "kafka://host:port" (or bare host:port) → (host, port). */
  def parseServer(url: String): (String, Int) =
    if (url.contains("://")) {
      val u = java.net.URI.create(url)
      require(u.getScheme == "kafka" || u.getScheme == "kafkas",
        s"kafka server url must be kafka://host:port, got $url")
      (u.getHost, if (u.getPort > 0) u.getPort else 9092)
    } else {
      val i = url.lastIndexOf(':')
      require(i > 0, s"kafka server must be host:port, got $url")
      (url.substring(0, i), url.substring(i + 1).toInt)
    }
}

/** Blocking Kafka client: synchronous request/response per call (one
  * in flight — the reference's per-connection usage), explicit
  * (topic, partition) addressing.
  */
final class KafkaClient private (socket: Socket, clientId: String,
                                 sasl: Option[(String, String)]) {
  import Kafka._

  private val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))
  private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
  private var correlation = 0

  /** One framed round trip; returns the response body reader. */
  private def call(apiKey: Int, apiVersion: Int)(body: DataOutputStream => Unit): DataInputStream =
    this.synchronized {
      correlation += 1
      val cid = correlation
      val req = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(req)
      d.writeShort(apiKey); d.writeShort(apiVersion); d.writeInt(cid)
      putString(d, clientId)
      body(d)
      d.flush()
      out.writeInt(req.size())
      req.writeTo(out)
      out.flush()
      val size = in.readInt()
      val resp = new Array[Byte](size)
      in.readFully(resp)
      val r = new DataInputStream(new java.io.ByteArrayInputStream(resp))
      val gotCid = r.readInt()
      if (gotCid != cid)
        throw new java.io.IOException(s"kafka: correlation mismatch ($gotCid != $cid)")
      r
    }

  // SASL PLAIN before anything else (reference saslAuthType=plain,
  // extensions/impl/kafka/source.go:268-271)
  sasl.foreach { case (user, pass) =>
    val h = call(ApiSaslHandshake, 1) { d => putString(d, "PLAIN") }
    val err = h.readShort()
    if (err != 0) throw new java.io.IOException(s"kafka: SASL handshake error $err")
    val token = (" " + user + " " + pass).getBytes(StandardCharsets.UTF_8)
    val a = call(ApiSaslAuthenticate, 0) { d => putBytes(d, token) }
    val aerr = a.readShort()
    if (aerr != 0) {
      val msg = readString(a)
      throw new java.io.IOException(s"kafka: SASL authentication failed: $msg")
    }
  }

  /** Produce one batch at acks=-1; returns the assigned base offset. */
  def produce(topic: String, partition: Int,
              records: Seq[(Array[Byte], Array[Byte])]): Long = {
    val batch = encodeBatch(0L, System.currentTimeMillis(), records)
    val r = call(ApiProduce, 3) { d =>
      putString(d, null) // transactional_id
      d.writeShort(-1) // acks: full ISR
      d.writeInt(30000) // timeout
      d.writeInt(1); putString(d, topic)
      d.writeInt(1); d.writeInt(partition)
      putBytes(d, batch)
    }
    val nTopics = r.readInt()
    var baseOffset = -1L
    for (_ <- 0 until nTopics) {
      readString(r)
      val nParts = r.readInt()
      for (_ <- 0 until nParts) {
        r.readInt() // partition index
        val err = r.readShort()
        if (err != 0) throw new java.io.IOException(s"kafka: produce error code $err")
        baseOffset = r.readLong()
        r.readLong() // log_append_time
      }
    }
    baseOffset
  }

  def produceStrings(topic: String, partition: Int, values: Seq[String]): Long =
    produce(topic, partition,
      values.map(v => (null: Array[Byte]) -> v.getBytes(StandardCharsets.UTF_8)))

  /** Fetch records from `offset`; returns (highWatermark, records). */
  def fetch(topic: String, partition: Int, offset: Long,
            maxWaitMs: Int = 500, maxBytes: Int = 1 << 20): (Long, Seq[Record]) = {
    val r = call(ApiFetch, 4) { d =>
      d.writeInt(-1) // replica_id: consumer
      d.writeInt(maxWaitMs)
      d.writeInt(1) // min_bytes
      d.writeInt(maxBytes)
      d.writeByte(0) // isolation: read_uncommitted
      d.writeInt(1); putString(d, topic)
      d.writeInt(1); d.writeInt(partition); d.writeLong(offset); d.writeInt(maxBytes)
    }
    r.readInt() // throttle
    var hw = -1L
    val recs = scala.collection.mutable.ArrayBuffer[Record]()
    val nTopics = r.readInt()
    for (_ <- 0 until nTopics) {
      readString(r)
      val nParts = r.readInt()
      for (_ <- 0 until nParts) {
        r.readInt() // partition
        val err = r.readShort()
        if (err != 0) throw new java.io.IOException(s"kafka: fetch error code $err")
        hw = r.readLong()
        r.readLong() // last_stable_offset
        val nAborted = r.readInt()
        for (_ <- 0 until math.max(nAborted, 0)) { r.readLong(); r.readLong() }
        val set = readBytes(r)
        // a broker may return the whole batch containing `offset`;
        // drop the records below the requested position
        recs ++= decodeBatches(set).filter(_.offset >= offset)
      }
    }
    (hw, recs.toSeq)
  }

  /** Earliest (-2) or latest (-1) offset via ListOffsets v1. */
  def listOffset(topic: String, partition: Int, timestamp: Long): Long = {
    val r = call(ApiListOffsets, 1) { d =>
      d.writeInt(-1) // replica_id
      d.writeInt(1); putString(d, topic)
      d.writeInt(1); d.writeInt(partition); d.writeLong(timestamp)
    }
    var off = -1L
    val nTopics = r.readInt()
    for (_ <- 0 until nTopics) {
      readString(r)
      val nParts = r.readInt()
      for (_ <- 0 until nParts) {
        r.readInt()
        val err = r.readShort()
        if (err != 0) throw new java.io.IOException(s"kafka: listOffsets error code $err")
        r.readLong() // timestamp
        off = r.readLong()
      }
    }
    off
  }

  def earliestOffset(topic: String, partition: Int): Long = listOffset(topic, partition, -2L)
  def latestOffset(topic: String, partition: Int): Long = listOffset(topic, partition, -1L)

  def close(): Unit = try socket.close() catch { case _: Exception => () }
}

object KafkaClient {
  /** Connect (kafka:// plaintext, kafkas:// or explicit config TLS),
    * optionally SASL-PLAIN authenticating first. Auth failure throws
    * and closes the socket.
    */
  def connect(serverUrl: String, clientId: String = "graft",
              sasl: Option[(String, String)] = None,
              tls: Option[Tls.ClientConfig] = None): KafkaClient = {
    val (host, port) = Kafka.parseServer(serverUrl)
    val effectiveTls =
      if (tls.isEmpty && serverUrl.startsWith("kafkas://")) Some(Tls.ClientConfig()) else tls
    val s = Tls.socket(host, port, effectiveTls)
    try new KafkaClient(s, clientId, sasl)
    catch {
      case e: Throwable =>
        try s.close() catch { case _: Exception => () }
        throw e
    }
  }
}

/** Minimal in-process Kafka broker: an append-only in-memory log per
  * (topic, partition) serving Produce v3 / Fetch v4 / ListOffsets v1
  * (+ SASL PLAIN when credentials are set), one thread per connection
  * (test scale). Topics auto-create on first produce, like a dev
  * broker. Production points [[KafkaClient]] at a real cluster; this
  * stub makes the transport end-to-end testable without egress,
  * exactly like [[MqttBroker]] / [[RedisStubServer]].
  */
final class KafkaStubBroker private (server: ServerSocket,
                                    sasl: Option[(String, String)]) {
  import Kafka._

  /** One partition log: batches re-encoded at their assigned base
    * offset, plus the next offset (the high watermark).
    */
  private final class Log {
    val batches = scala.collection.mutable.ArrayBuffer[(Long, Array[Byte], Int)]()
    var nextOffset = 0L
  }
  private val logs = new ConcurrentHashMap[(String, Int), Log]()
  @volatile private var closed = false

  def port: Int = server.getLocalPort
  def address: String = s"kafka://${server.getInetAddress.getHostAddress}:$port"

  /** Observation point for tests. */
  def highWatermark(topic: String, partition: Int): Long = {
    val l = logs.get((topic, partition))
    if (l == null) 0L else l.synchronized(l.nextOffset)
  }

  private val acceptThread = new Thread(() => {
    try while (!closed) {
      val s = server.accept()
      s.setTcpNoDelay(true)
      val t = new Thread(() => serve(s), s"kafka-stub-conn-${s.getPort}")
      t.setDaemon(true)
      t.start()
    } catch { case _: Exception => () }
  }, "kafka-stub-accept")
  acceptThread.setDaemon(true)
  acceptThread.start()

  private def serve(socket: Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))
    var authed = sasl.isEmpty
    def reply(cid: Int)(body: DataOutputStream => Unit): Unit = {
      val buf = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(buf)
      d.writeInt(cid)
      body(d)
      d.flush()
      out.writeInt(buf.size()); buf.writeTo(out); out.flush()
    }
    try {
      while (true) {
        val size = in.readInt()
        val req = new Array[Byte](size)
        in.readFully(req)
        val r = new DataInputStream(new java.io.ByteArrayInputStream(req))
        val apiKey = r.readShort()
        val apiVersion = r.readShort()
        val cid = r.readInt()
        readString(r) // client id
        apiKey.toInt match {
          case ApiSaslHandshake =>
            val mech = readString(r)
            reply(cid) { d =>
              if (mech == "PLAIN") { d.writeShort(0); d.writeInt(1); putString(d, "PLAIN") }
              else { d.writeShort(33 /* UNSUPPORTED_SASL_MECHANISM */); d.writeInt(1); putString(d, "PLAIN") }
            }
          case ApiSaslAuthenticate =>
            val token = readBytes(r)
            val parts = new String(token, StandardCharsets.UTF_8).split(" ", -1)
            val ok = sasl.exists { case (u, p) =>
              parts.length == 3 &&
                java.security.MessageDigest.isEqual(parts(1).getBytes(StandardCharsets.UTF_8), u.getBytes(StandardCharsets.UTF_8)) &&
                java.security.MessageDigest.isEqual(parts(2).getBytes(StandardCharsets.UTF_8), p.getBytes(StandardCharsets.UTF_8))
            }
            authed = authed || ok
            reply(cid) { d =>
              if (ok || sasl.isEmpty) { d.writeShort(0); putString(d, null); putBytes(d, Array.emptyByteArray) }
              else { d.writeShort(58 /* SASL_AUTHENTICATION_FAILED */); putString(d, "Authentication failed"); putBytes(d, Array.emptyByteArray) }
            }
          case _ if !authed =>
            // drop unauthenticated traffic: close, like a real broker
            socket.close(); return
          case ApiProduce =>
            readString(r) // transactional_id
            r.readShort(); r.readInt() // acks, timeout
            val nTopics = r.readInt()
            val results = for (_ <- 0 until nTopics) yield {
              val topic = readString(r)
              val nParts = r.readInt()
              topic -> (for (_ <- 0 until nParts) yield {
                val partition = r.readInt()
                val set = readBytes(r)
                val records = decodeBatches(set)
                val log = logs.computeIfAbsent((topic, partition), _ => new Log)
                val base = log.synchronized {
                  val b = log.nextOffset
                  // re-encode at the assigned base offset so fetches
                  // return absolute offsets (what a real broker's
                  // append does)
                  val rebased = encodeBatch(b,
                    records.headOption.map(_.timestamp).getOrElse(0L),
                    records.map(x => x.key -> x.value))
                  log.batches += ((b, rebased, records.size))
                  log.nextOffset = b + records.size
                  b
                }
                (partition, base)
              })
            }
            reply(cid) { d =>
              d.writeInt(results.size)
              results.foreach { case (topic, parts) =>
                putString(d, topic)
                d.writeInt(parts.size)
                parts.foreach { case (p, base) =>
                  d.writeInt(p); d.writeShort(0); d.writeLong(base); d.writeLong(-1L)
                }
              }
              d.writeInt(0) // throttle
            }
          case ApiFetch =>
            r.readInt() // replica
            val maxWait = r.readInt()
            r.readInt(); r.readInt(); r.readByte() // min/max bytes, isolation
            val nTopics = r.readInt()
            val wants = for (_ <- 0 until nTopics) yield {
              val topic = readString(r)
              val nParts = r.readInt()
              topic -> (for (_ <- 0 until nParts) yield {
                val p = r.readInt(); val off = r.readLong(); r.readInt()
                (p, off)
              })
            }
            // crude long-poll: if nothing is available, wait up to maxWait
            def available: Boolean = wants.exists { case (t, ps) =>
              ps.exists { case (p, off) => highWatermark(t, p) > off }
            }
            val deadline = System.currentTimeMillis() + math.min(maxWait, 2000)
            while (!available && System.currentTimeMillis() < deadline) Thread.sleep(10)
            reply(cid) { d =>
              d.writeInt(0) // throttle
              d.writeInt(wants.size)
              wants.foreach { case (topic, ps) =>
                putString(d, topic)
                d.writeInt(ps.size)
                ps.foreach { case (p, off) =>
                  val log = logs.get((topic, p))
                  val (hw, data) =
                    if (log == null) (0L, null)
                    else log.synchronized {
                      val sets = log.batches.filter { case (base, _, n) => base + n > off }
                        .map(_._2)
                      (log.nextOffset,
                        if (sets.isEmpty) null else sets.reduce(_ ++ _))
                    }
                  d.writeInt(p); d.writeShort(0); d.writeLong(hw); d.writeLong(hw)
                  d.writeInt(0) // aborted transactions
                  putBytes(d, data)
                }
              }
            }
          case ApiListOffsets =>
            r.readInt() // replica
            val nTopics = r.readInt()
            val wants = for (_ <- 0 until nTopics) yield {
              val topic = readString(r)
              val nParts = r.readInt()
              topic -> (for (_ <- 0 until nParts) yield {
                val p = r.readInt(); val ts = r.readLong(); (p, ts)
              })
            }
            reply(cid) { d =>
              d.writeInt(wants.size)
              wants.foreach { case (topic, ps) =>
                putString(d, topic)
                d.writeInt(ps.size)
                ps.foreach { case (p, ts) =>
                  val off = if (ts == -2L) 0L else highWatermark(topic, p)
                  d.writeInt(p); d.writeShort(0); d.writeLong(-1L); d.writeLong(off)
                }
              }
            }
          case other =>
            reply(cid) { d => d.writeShort(35 /* UNSUPPORTED_VERSION */) }
            System.err.println(s"[kafka-stub] unsupported api $other v$apiVersion")
        }
      }
    } catch {
      case _: EOFException => ()
      case _: Exception => ()
    } finally {
      try socket.close() catch { case _: Exception => () }
    }
  }

  def close(): Unit = {
    closed = true
    try server.close() catch { case _: Exception => () }
  }
}

object KafkaStubBroker {
  /** With `sasl`, every api before a successful SASL PLAIN exchange is
    * refused (connection closed), and wrong credentials get error 58.
    */
  def start(port: Int = 0, sasl: Option[(String, String)] = None,
            tls: Option[Tls.ServerConfig] = None): KafkaStubBroker = {
    val server = tls match {
      case Some(cfg) => Tls.serverSocket(port, cfg)
      case None => new ServerSocket(port, 50, InetAddress.getLoopbackAddress)
    }
    new KafkaStubBroker(server, sasl)
  }
}
