package graft.net

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

/** Minimal HTTP/2 (RFC 7540) over cleartext TCP (h2c with prior
  * knowledge) carrying unary gRPC (the PUBLIC grpc-over-http2 wire
  * spec): connection preface, SETTINGS exchange, HEADERS + DATA
  * frames, WINDOW_UPDATE bookkeeping, PING reply, and gRPC's 5-byte
  * `flag ++ len32` message framing with `grpc-status` trailers.
  *
  * HPACK (RFC 7541): full integer/string primitives, the complete
  * 61-entry static table, a dynamic table on the DECODE side
  * (incremental-indexing entries are stored and resolvable), and
  * literal-without-indexing on the ENCODE side. Huffman-coded string
  * literals are NOT decoded (the H bit raises a clear error): graft's
  * own peers never emit them, and a real grpc-go server MAY — the one
  * documented interop boundary of this dependency-free transport.
  */
object Http2 {
  val Preface: Array[Byte] = "PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n".getBytes(US_ASCII)

  // frame types
  val DATA = 0x0
  val HEADERS = 0x1
  val RST_STREAM = 0x3
  val SETTINGS = 0x4
  val PING = 0x6
  val GOAWAY = 0x7
  val WINDOW_UPDATE = 0x8

  final case class Frame(tpe: Int, flags: Int, streamId: Int, payload: Array[Byte])

  def writeFrame(out: DataOutputStream, f: Frame): Unit = {
    out.writeByte((f.payload.length >> 16) & 0xff)
    out.writeByte((f.payload.length >> 8) & 0xff)
    out.writeByte(f.payload.length & 0xff)
    out.writeByte(f.tpe)
    out.writeByte(f.flags)
    out.writeInt(f.streamId & 0x7fffffff)
    out.write(f.payload)
    out.flush()
  }

  def readFrame(in: DataInputStream): Frame = {
    val len = (in.readUnsignedByte() << 16) | (in.readUnsignedByte() << 8) | in.readUnsignedByte()
    require(len <= (1 << 24) - 1 && len >= 0, s"h2 frame too large: $len")
    val tpe = in.readUnsignedByte()
    val flags = in.readUnsignedByte()
    val sid = in.readInt() & 0x7fffffff
    val payload = new Array[Byte](len)
    in.readFully(payload)
    Frame(tpe, flags, sid, payload)
  }

  /** gRPC message framing: flag(0) + u32 length + body. */
  def grpcFrame(msg: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + msg.length)
    out(0) = 0
    out(1) = ((msg.length >> 24) & 0xff).toByte
    out(2) = ((msg.length >> 16) & 0xff).toByte
    out(3) = ((msg.length >> 8) & 0xff).toByte
    out(4) = (msg.length & 0xff).toByte
    System.arraycopy(msg, 0, out, 5, msg.length)
    out
  }

  def grpcUnframe(data: Array[Byte]): Array[Byte] = {
    require(data.length >= 5, "grpc frame too short")
    require(data(0) == 0, "compressed grpc frames unsupported")
    val len = ((data(1) & 0xff) << 24) | ((data(2) & 0xff) << 16) |
      ((data(3) & 0xff) << 8) | (data(4) & 0xff)
    java.util.Arrays.copyOfRange(data, 5, 5 + len)
  }
}

/** RFC 7541 HPACK: the primitives + static table + decode-side
  * dynamic table. Encoding always uses literal-without-indexing (a
  * fully compliant, stateless choice).
  */
object Hpack {
  /** The complete static table (RFC 7541 Appendix A). */
  val staticTable: IndexedSeq[(String, String)] = IndexedSeq(
    ":authority" -> "", ":method" -> "GET", ":method" -> "POST", ":path" -> "/",
    ":path" -> "/index.html", ":scheme" -> "http", ":scheme" -> "https",
    ":status" -> "200", ":status" -> "204", ":status" -> "206", ":status" -> "304",
    ":status" -> "400", ":status" -> "404", ":status" -> "500",
    "accept-charset" -> "", "accept-encoding" -> "gzip, deflate",
    "accept-language" -> "", "accept-ranges" -> "", "accept" -> "",
    "access-control-allow-origin" -> "", "age" -> "", "allow" -> "",
    "authorization" -> "", "cache-control" -> "", "content-disposition" -> "",
    "content-encoding" -> "", "content-language" -> "", "content-length" -> "",
    "content-location" -> "", "content-range" -> "", "content-type" -> "",
    "cookie" -> "", "date" -> "", "etag" -> "", "expect" -> "", "expires" -> "",
    "from" -> "", "host" -> "", "if-match" -> "", "if-modified-since" -> "",
    "if-none-match" -> "", "if-range" -> "", "if-unmodified-since" -> "",
    "last-modified" -> "", "link" -> "", "location" -> "", "max-forwards" -> "",
    "proxy-authenticate" -> "", "proxy-authorization" -> "", "range" -> "",
    "referer" -> "", "refresh" -> "", "retry-after" -> "", "server" -> "",
    "set-cookie" -> "", "strict-transport-security" -> "", "transfer-encoding" -> "",
    "user-agent" -> "", "vary" -> "", "via" -> "", "www-authenticate" -> "")

  private def writeInt(out: mutable.ArrayBuffer[Byte], value: Int,
                       prefixBits: Int, firstByteFlags: Int): Unit = {
    val max = (1 << prefixBits) - 1
    if (value < max) out += (firstByteFlags | value).toByte
    else {
      out += (firstByteFlags | max).toByte
      var v = value - max
      while (v >= 128) { out += ((v % 128) + 128).toByte; v /= 128 }
      out += v.toByte
    }
  }

  private def writeString(out: mutable.ArrayBuffer[Byte], s: String): Unit = {
    val b = s.getBytes(UTF_8)
    writeInt(out, b.length, 7, 0x00) // H=0: no huffman
    out ++= b
  }

  /** Encode headers as literal-without-indexing with new names. */
  def encode(headers: Seq[(String, String)]): Array[Byte] = {
    val out = mutable.ArrayBuffer[Byte]()
    headers.foreach { case (name, value) =>
      out += 0x00 // literal without indexing, new name
      writeString(out, name)
      writeString(out, value)
    }
    out.toArray
  }

  /** Decoder with a per-connection dynamic table. */
  final class Decoder {
    private val dynamic = mutable.ArrayDeque[(String, String)]()
    private var maxDynamic = 4096
    private var dynSize = 0

    private def entry(idx: Int): (String, String) =
      if (idx >= 1 && idx <= staticTable.length) staticTable(idx - 1)
      else {
        val di = idx - staticTable.length - 1
        require(di >= 0 && di < dynamic.length, s"HPACK index $idx out of range")
        dynamic(di)
      }

    private def add(name: String, value: String): Unit = {
      val size = name.length + value.length + 32
      dynamic.prepend((name, value))
      dynSize += size
      while (dynSize > maxDynamic && dynamic.nonEmpty) {
        val (n, v) = dynamic.removeLast()
        dynSize -= n.length + v.length + 32
      }
    }

    def decode(block: Array[Byte]): Seq[(String, String)] = {
      val out = mutable.ArrayBuffer[(String, String)]()
      var pos = 0
      def readInt(prefixBits: Int): Int = {
        val max = (1 << prefixBits) - 1
        var v = block(pos) & max
        pos += 1
        if (v == max) {
          var m = 0
          var cont = true
          while (cont) {
            val b = block(pos) & 0xff
            pos += 1
            v += (b & 0x7f) << m
            m += 7
            cont = (b & 0x80) != 0
          }
        }
        v
      }
      def readString(): String = {
        val huffman = (block(pos) & 0x80) != 0
        val len = readInt(7)
        require(!huffman,
          "HPACK huffman-coded literals unsupported (graft peers never emit them)")
        val s = new String(block, pos, len, UTF_8)
        pos += len
        s
      }
      while (pos < block.length) {
        val b = block(pos) & 0xff
        if ((b & 0x80) != 0) { // indexed
          val idx = readInt(7)
          out += entry(idx)
        } else if ((b & 0xc0) == 0x40) { // literal with incremental indexing
          val idx = readInt(6)
          val name = if (idx == 0) readString() else entry(idx)._1
          val value = readString()
          add(name, value)
          out += (name -> value)
        } else if ((b & 0xe0) == 0x20) { // dynamic table size update
          maxDynamic = readInt(5)
          while (dynSize > maxDynamic && dynamic.nonEmpty) {
            val (n, v) = dynamic.removeLast()
            dynSize -= n.length + v.length + 32
          }
        } else { // literal without indexing (0x00) / never indexed (0x10)
          val idx = readInt(4)
          val name = if (idx == 0) readString() else entry(idx)._1
          out += (name -> readString())
        }
      }
      out.toSeq
    }
  }
}

/** One h2c connection carrying serial unary gRPC calls — the client
  * side of the reference's shared grpc.ClientConn.
  */
final class GrpcConnection private[net] (socket: Socket, in: DataInputStream,
                                         out: DataOutputStream, authority: String)
    extends AutoCloseable {
  import Http2._
  private val decoder = new Hpack.Decoder
  private var nextStream = 1

  private[net] def handshake(): Unit = {
    out.write(Preface)
    writeFrame(out, Frame(SETTINGS, 0, 0, Array.emptyByteArray))
    // server SETTINGS must arrive first; ack it
    val f = readFrame(in)
    require(f.tpe == SETTINGS, s"expected SETTINGS, got type ${f.tpe}")
    writeFrame(out, Frame(SETTINGS, 0x1, 0, Array.emptyByteArray))
  }

  /** One unary call: returns the response message bytes; non-zero
    * grpc-status raises with the status message.
    */
  def unary(path: String, message: Array[Byte]): Array[Byte] = synchronized {
    val sid = nextStream
    nextStream += 2
    val headers = Hpack.encode(Seq(
      ":method" -> "POST", ":scheme" -> "http", ":path" -> path,
      ":authority" -> authority, "content-type" -> "application/grpc",
      "te" -> "trailers"))
    writeFrame(out, Frame(HEADERS, 0x4, sid, headers)) // END_HEADERS
    // split DATA at the peer's default SETTINGS_MAX_FRAME_SIZE (16384)
    // — one oversized frame is a FRAME_SIZE_ERROR on a compliant peer
    val body = grpcFrame(message)
    val chunks = body.grouped(16384).toSeq
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val endStream = if (i == chunks.length - 1) 0x1 else 0x0
      writeFrame(out, Frame(DATA, endStream, sid, chunk))
    }
    var data = Array.emptyByteArray
    var status = -1
    var statusMsg = ""
    var done = false
    while (!done) {
      val f = readFrame(in)
      f.tpe match {
        case SETTINGS =>
          if ((f.flags & 0x1) == 0) writeFrame(out, Frame(SETTINGS, 0x1, 0, Array.emptyByteArray))
        case PING =>
          if ((f.flags & 0x1) == 0) writeFrame(out, Frame(PING, 0x1, 0, f.payload))
        case WINDOW_UPDATE => ()
        case HEADERS if f.streamId == sid =>
          val hs = decoder.decode(f.payload)
          hs.foreach {
            case ("grpc-status", v) => status = v.toInt
            case ("grpc-message", v) => statusMsg = v
            case (":status", v) =>
              require(v == "200", s"grpc transport error: HTTP $v")
            case _ => ()
          }
          if ((f.flags & 0x1) != 0) done = true // END_STREAM: trailers seen
        case DATA if f.streamId == sid =>
          data ++= f.payload
          // replenish BOTH flow-control windows: a compliant sender
          // stops at the 65535-byte default — stream-level too, or a
          // >64 KiB unary response deadlocks the read loop
          if (f.payload.nonEmpty) {
            val win = java.nio.ByteBuffer.allocate(4).putInt(f.payload.length).array()
            writeFrame(out, Frame(WINDOW_UPDATE, 0, 0, win))
            if ((f.flags & 0x1) == 0) writeFrame(out, Frame(WINDOW_UPDATE, 0, sid, win))
          }
          if ((f.flags & 0x1) != 0) done = true
        case RST_STREAM if f.streamId == sid =>
          throw new java.io.IOException("grpc stream reset by server")
        case GOAWAY =>
          throw new java.io.IOException("grpc connection going away")
        case _ => () // frames for other streams / extensions: ignore
      }
    }
    require(status == 0, s"grpc call $path failed: status $status $statusMsg")
    grpcUnframe(data)
  }

  def isOpen: Boolean = !socket.isClosed
  def close(): Unit = { try socket.close() catch { case _: Exception => () } }
}

object GrpcClient {
  def connect(host: String, port: Int): GrpcConnection = {
    val s = new Socket()
    s.setTcpNoDelay(true)
    s.connect(new InetSocketAddress(host, port), 5000)
    val conn = new GrpcConnection(s,
      new DataInputStream(new java.io.BufferedInputStream(s.getInputStream)),
      new DataOutputStream(new java.io.BufferedOutputStream(s.getOutputStream)),
      s"$host:$port")
    try { conn.handshake(); conn }
    catch { case e: Exception => conn.close(); throw e }
  }

  /** Shared per-endpoint connections (executor-side), like the
    * reference's one grpc.ClientConn per service.
    */
  private val shared = new ConcurrentHashMap[String, GrpcConnection]()
  def unary(host: String, port: Int, path: String, message: Array[Byte]): Array[Byte] = {
    val conn = shared.compute(s"$host:$port", (_, existing) =>
      if (existing != null && existing.isOpen) existing else connect(host, port))
    try conn.unary(path, message)
    catch {
      case e: java.io.IOException =>
        // dead connection: drop it so the next call redials
        shared.remove(s"$host:$port")
        throw e
    }
  }
  def closeShared(): Unit = {
    shared.forEach((_, c) => c.close())
    shared.clear()
  }
}

/** Minimal unary gRPC SERVER over h2c — the external service a test
  * registers (and a reference for the frame layer's symmetry). One
  * thread per connection; streams answered in completion order.
  */
final class GrpcServer private (server: ServerSocket,
                                handler: (String, Array[Byte]) => Array[Byte])
    extends AutoCloseable {
  import Http2._
  @volatile private var running = true
  def port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (running)
      try {
        val s = server.accept()
        s.setTcpNoDelay(true)
        val t = new Thread(() => serve(s), s"grpc-server-conn-$port")
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => () }
  }, "grpc-server-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private final class StreamState {
    var path: String = ""
    var data: Array[Byte] = Array.emptyByteArray
  }

  private def serve(s: Socket): Unit = {
    val in = new DataInputStream(new java.io.BufferedInputStream(s.getInputStream))
    val out = new DataOutputStream(new java.io.BufferedOutputStream(s.getOutputStream))
    val decoder = new Hpack.Decoder
    try {
      val preface = new Array[Byte](Preface.length)
      in.readFully(preface)
      require(java.util.Arrays.equals(preface, Preface), "bad h2 preface")
      writeFrame(out, Frame(SETTINGS, 0, 0, Array.emptyByteArray))
      val streams = mutable.Map[Int, StreamState]()
      while (true) {
        val f = readFrame(in)
        f.tpe match {
          case SETTINGS =>
            if ((f.flags & 0x1) == 0)
              writeFrame(out, Frame(SETTINGS, 0x1, 0, Array.emptyByteArray))
          case PING =>
            if ((f.flags & 0x1) == 0) writeFrame(out, Frame(PING, 0x1, 0, f.payload))
          case WINDOW_UPDATE => ()
          case HEADERS =>
            val st = streams.getOrElseUpdate(f.streamId, new StreamState)
            decoder.decode(f.payload).foreach {
              case (":path", v) => st.path = v
              case _ => ()
            }
            if ((f.flags & 0x1) != 0) respond(out, f.streamId, streams.remove(f.streamId).get)
          case DATA =>
            val st = streams.getOrElseUpdate(f.streamId, new StreamState)
            st.data ++= f.payload
            if (f.payload.nonEmpty) {
              val win = java.nio.ByteBuffer.allocate(4).putInt(f.payload.length).array()
              writeFrame(out, Frame(WINDOW_UPDATE, 0, 0, win))
              if ((f.flags & 0x1) == 0) writeFrame(out, Frame(WINDOW_UPDATE, 0, f.streamId, win))
            }
            if ((f.flags & 0x1) != 0) respond(out, f.streamId, streams.remove(f.streamId).get)
          case RST_STREAM => streams.remove(f.streamId)
          case GOAWAY => return
          case _ => ()
        }
      }
    } catch { case _: Exception => () }
    finally { try s.close() catch { case _: Exception => () } }
  }

  private def respond(out: DataOutputStream, sid: Int, st: StreamState): Unit = {
    val (status, msg, body) =
      try {
        val resp = handler(st.path, grpcUnframe(st.data))
        (0, "", resp)
      } catch {
        case e: Exception => (2, String.valueOf(e.getMessage), Array.emptyByteArray)
      }
    writeFrame(out, Frame(HEADERS, 0x4, sid, Hpack.encode(Seq(
      ":status" -> "200", "content-type" -> "application/grpc"))))
    if (status == 0 && body.nonEmpty)
      grpcFrame(body).grouped(16384).foreach(chunk =>
        writeFrame(out, Frame(DATA, 0, sid, chunk)))
    writeFrame(out, Frame(HEADERS, 0x4 | 0x1, sid, Hpack.encode(
      Seq("grpc-status" -> status.toString) ++
        (if (msg.nonEmpty) Seq("grpc-message" -> msg) else Nil))))
  }

  def close(): Unit = {
    running = false
    try server.close() catch { case _: Exception => () }
  }
}

object GrpcServer {
  def start(handler: (String, Array[Byte]) => Array[Byte], port: Int = 0): GrpcServer = {
    val server = new ServerSocket()
    server.setReuseAddress(true)
    server.bind(new InetSocketAddress("127.0.0.1", port))
    new GrpcServer(server, handler)
  }
}
