package graft

import graft.net.{GrpcClient, GrpcServer, Hpack, Msgpack, MsgpackRpcClient, MsgpackRpcServer}
import graft.rules.{RuleApi, RuleEngine}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** msgpack + msgpack-RPC and h2c/gRPC wire protocols behind external
  * services (SURVEY §2.8; reference internal/service
  * executors_msgpack.go + executors.go grpcExecutor).
  */
class RpcSpec extends SparkSuite {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  // ---- msgpack codec ----

  test("msgpack golden encodings match the public spec") {
    assert(hex(Msgpack.encode(7L)) == "07")
    assert(hex(Msgpack.encode(-1L)) == "ff")
    assert(hex(Msgpack.encode(200L)) == "ccc8")
    assert(hex(Msgpack.encode(-200L)) == "d1ff38")
    assert(hex(Msgpack.encode(70000L)) == "ce00011170")
    assert(hex(Msgpack.encode(null)) == "c0")
    assert(hex(Msgpack.encode(true)) == "c3")
    assert(hex(Msgpack.encode(false)) == "c2")
    assert(hex(Msgpack.encode("abc")) == "a3616263")
    assert(hex(Msgpack.encode(1.5)) == "cb3ff8000000000000")
    assert(hex(Msgpack.encode(Seq[Any](1L, 2L))) == "920102")
    assert(hex(Msgpack.encode(Map("a" -> 1L))) == "81a16101")
  }

  test("msgpack round-trips nested structures and all families") {
    val v: Any = Map(
      "id" -> 42L, "neg" -> -12345L, "pi" -> 3.14159,
      "name" -> "graft", "ok" -> true, "nothing" -> null,
      "bytes" -> Array[Byte](1, 2, 3),
      "list" -> Seq[Any](1L, "two", Map("three" -> 3L)),
      "long_string" -> ("x" * 300))
    val decoded = Msgpack.decode(Msgpack.encode(v)).asInstanceOf[Map[String, Any]]
    assert(decoded("id") == 42L && decoded("neg") == -12345L)
    assert(decoded("pi") == 3.14159 && decoded("name") == "graft")
    assert(decoded("ok") == true && decoded("nothing") == null)
    assert(decoded("bytes").asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, 3))
    assert(decoded("list").asInstanceOf[Seq[Any]](2) == Map("three" -> 3L))
    assert(decoded("long_string") == "x" * 300)
  }

  // ---- msgpack-rpc ----

  test("msgpack-rpc: call round trip, error member, unknown method") {
    val server = MsgpackRpcServer.start(Map(
      "mul" -> (ps => ps match {
        case Seq(a: Long, b: Long) => a * b
        case other => throw new IllegalArgumentException(s"bad params $other")
      }),
      "boom" -> (_ => throw new RuntimeException("kaput"))))
    try {
      val cli = MsgpackRpcClient.connect("127.0.0.1", server.port)
      try {
        assert(cli.call("mul", Seq(6L, 7L)) == 42L)
        val e1 = intercept[RuntimeException](cli.call("boom", Nil))
        assert(e1.getMessage.contains("kaput"))
        val e2 = intercept[RuntimeException](cli.call("nope", Nil))
        assert(e2.getMessage.contains("can't find method"))
        // connection survives errors: calls still work after
        assert(cli.call("mul", Seq(3L, 3L)) == 9L)
      } finally cli.close()
    } finally server.close()
  }

  test("msgpack external service: SQL function calls the live RPC server") {
    val server = MsgpackRpcServer.start(Map(
      "mp_scale" -> (ps => ps match {
        case Seq(x: Long, f: Double) => x * f
        case other => throw new IllegalArgumentException(s"bad params $other")
      })))
    try {
      val a = new RuleApi(new RuleEngine(spark))
      val (c, _) = a.handle("POST", "/services",
        s"""{"name":"mpsvc","addr":"tcp://127.0.0.1:${server.port}","protocol":"msgpack",
            "functions":[{"name":"mp_scale","returnType":"double"}]}""")
      assert(c == 200)
      import spark.implicits._
      val out = Seq((4L, 2.5), (10L, 0.5)).toDF("x", "f")
        .selectExpr("mp_scale(x, f) AS v").orderBy("v")
        .collect().map(_.getDouble(0)).toSeq
      assert(out == Seq(5.0, 10.0))
    } finally { server.close(); MsgpackRpcClient.closeShared() }
  }

  // ---- hpack ----

  test("hpack: literal encode decodes back; static + dynamic indexing resolve") {
    val dec = new Hpack.Decoder
    val hs = Seq(":method" -> "POST", ":path" -> "/x.Y/Z", "content-type" -> "application/grpc")
    assert(dec.decode(Hpack.encode(hs)) == hs)
    // indexed static entry: 0x88 = index 8 = :status 200
    assert(dec.decode(Array(0x88.toByte)) == Seq(":status" -> "200"))
    // literal WITH incremental indexing (0x40) enters the dynamic
    // table at index 62; an indexed ref then resolves it
    val name = "x-custom".getBytes
    val value = "yes".getBytes
    val block = Array[Byte](0x40.toByte, name.length.toByte) ++ name ++
      Array[Byte](value.length.toByte) ++ value
    assert(dec.decode(block) == Seq("x-custom" -> "yes"))
    assert(dec.decode(Array((0x80 | 62).toByte)) == Seq("x-custom" -> "yes"))
  }

  test("hpack: huffman-coded literals decode (RFC 7541 C.4.1/C.6.1 vectors)") {
    def bytes(hex: String): Array[Byte] =
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // "www.example.com" huffman-encodes to f1e3c2e5f23a6ba0ab90f4ff
    assert(Hpack.huffmanDecode(bytes("f1e3c2e5f23a6ba0ab90f4ff"), 0, 12) == "www.example.com")
    // "302" → 6402, "private" → aec3771a4b (C.6.1)
    assert(Hpack.huffmanDecode(bytes("6402"), 0, 2) == "302")
    assert(Hpack.huffmanDecode(bytes("aec3771a4b"), 0, 5) == "private")
    // full header block: literal w/o indexing, name "host" plain,
    // value huffman-coded — the H bit drives the decoder
    val block = Array[Byte](0x00, 0x04, 'h', 'o', 's', 't',
      (0x80 | 12).toByte) ++ bytes("f1e3c2e5f23a6ba0ab90f4ff")
    assert(new Hpack.Decoder().decode(block) == Seq("host" -> "www.example.com"))
    // a dangling non-EOS-prefix padding is rejected
    intercept[IllegalArgumentException](Hpack.huffmanDecode(bytes("f1e3c2e5f23a6ba0ab90f400"), 0, 12))
  }

  // ---- grpc over h2c ----

  private val reqSchema = StructType(Seq(StructField("p1", LongType), StructField("p2", LongType)))
  private val respSchema = StructType(Seq(StructField("r", LongType)))

  test("grpc unary: round trip through graft's own h2c client + server") {
    val server = GrpcServer.start((path, req) => {
      assert(path == "/graft.Calc/Add")
      val row = graft.functions.ProtobufLite.decode(req, reqSchema)
      graft.functions.ProtobufLite.encode(
        new GenericInternalRow(Array[Any](row.getLong(0) + row.getLong(1))), respSchema)
    })
    try {
      val conn = GrpcClient.connect("127.0.0.1", server.port)
      try {
        val req = graft.functions.ProtobufLite.encode(
          new GenericInternalRow(Array[Any](19L, 23L)), reqSchema)
        val resp = conn.unary("/graft.Calc/Add", req)
        assert(graft.functions.ProtobufLite.decode(resp, respSchema).getLong(0) == 42L)
        // second call on the SAME connection (stream id advances)
        val req2 = graft.functions.ProtobufLite.encode(
          new GenericInternalRow(Array[Any](1L, 2L)), reqSchema)
        assert(graft.functions.ProtobufLite.decode(
          conn.unary("/graft.Calc/Add", req2), respSchema).getLong(0) == 3L)
      } finally conn.close()
    } finally server.close()
  }

  test("grpc unary: requests past the 64 KiB flow-control window still complete") {
    // send-side flow control: 200 KB exceeds the default 65535-byte
    // connection/stream windows three times over — the client must
    // wait for WINDOW_UPDATE replenishment instead of blasting DATA
    val server = GrpcServer.start((path, req) => { assert(path == "/graft.Big/Echo"); req })
    try {
      val conn = GrpcClient.connect("127.0.0.1", server.port)
      try {
        val big = Array.tabulate(200000)(i => (i * 31).toByte)
        val resp = conn.unary("/graft.Big/Echo", big)
        assert(resp.length == big.length)
        assert(java.util.Arrays.equals(resp, big))
        // connection window survives for a second call
        val small = Array.tabulate(10)(_.toByte)
        assert(java.util.Arrays.equals(conn.unary("/graft.Big/Echo", small), small))
      } finally conn.close()
    } finally server.close()
  }

  test("grpc unary: handler errors surface as non-zero grpc-status") {
    val server = GrpcServer.start((_, _) => throw new IllegalStateException("no such thing"))
    try {
      val conn = GrpcClient.connect("127.0.0.1", server.port)
      try {
        val e = intercept[IllegalArgumentException](
          conn.unary("/x/Y", Array[Byte]()))
        assert(e.getMessage.contains("status 2") && e.getMessage.contains("no such thing"))
      } finally conn.close()
    } finally server.close()
  }

  test("grpc external service: SQL function invokes over h2c") {
    val strSchema = StructType(Seq(StructField("p1", StringType), StructField("p2", LongType)))
    val strResp = StructType(Seq(StructField("r", StringType)))
    val server = GrpcServer.start((path, req) => {
      assert(path == "/graft.Fmt/Tag")
      val row = graft.functions.ProtobufLite.decode(req, strSchema)
      graft.functions.ProtobufLite.encode(
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(s"${row.getUTF8String(0)}#${row.getLong(1)}"))), strResp)
    })
    try {
      val a = new RuleApi(new RuleEngine(spark))
      val (c, _) = a.handle("POST", "/services",
        s"""{"name":"gsvc","addr":"http://127.0.0.1:${server.port}","protocol":"grpc",
            "functions":[{"name":"g_tag","uri":"/graft.Fmt/Tag","returnType":"string"}]}""")
      assert(c == 200)
      import spark.implicits._
      val out = Seq(("a", 1L), ("b", 2L)).toDF("s", "n")
        .selectExpr("g_tag(s, n) AS t").orderBy("t")
        .collect().map(_.getString(0)).toSeq
      assert(out == Seq("a#1", "b#2"))
    } finally { server.close(); GrpcClient.closeShared() }
  }
}
