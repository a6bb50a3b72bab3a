package graft.net

import java.io.FileInputStream
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.KeyStore
import java.security.cert.{CertificateFactory, X509Certificate}
import java.security.spec.PKCS8EncodedKeySpec
import java.util.Base64
import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLServerSocket, SSLSocket, TrustManagerFactory, X509TrustManager}

/** TLS for the graft transports (mqtt / websocket / redis), built on the
  * JDK's SSLSocket — no new dependencies.
  *
  * Property names follow the reference's shared cert layer
  * (pkg/cert/cert.go:58,100): `certificationPath` (server/client cert,
  * PEM), `privateKeyPath` (unencrypted PKCS#8 PEM), `rootCaPath` (CA
  * bundle the peer is validated against, PEM), `skipCertVerify`
  * (disable chain + hostname validation — test/dev only). Every graft
  * connector shares this one config surface, exactly as every reference
  * connector shares pkg/cert.
  *
  * Client sockets with a rootCa validate the server chain AND the
  * hostname (endpoint identification "HTTPS"); `skipCertVerify = true`
  * trusts any chain. Plaintext remains the default everywhere — TLS
  * engages only when a config is present.
  */
object Tls {

  /** Client-side view: how to trust the server. */
  final case class ClientConfig(rootCaPath: Option[String] = None,
                                skipCertVerify: Boolean = false)

  /** Server-side view: the identity to present. */
  final case class ServerConfig(certificationPath: String, privateKeyPath: String)

  /** Extract a client config from connector options; None → plaintext.
    * TLS engages when any of rootCaPath / skipCertVerify / tls=true is
    * present (the reference enables it per-connector the same way).
    */
  def clientFromOptions(options: Map[String, String]): Option[ClientConfig] = {
    val root = options.get("rootCaPath").filter(_.nonEmpty)
    val skip = options.get("skipCertVerify").exists(_.equalsIgnoreCase("true"))
    val on = options.get("tls").exists(_.equalsIgnoreCase("true"))
    if (root.isDefined || skip || on) Some(ClientConfig(root, skip)) else None
  }

  // ---- PEM parsing (RFC 7468) ----

  /** All certificates in a PEM file (CertificateFactory handles the
    * base64 blocks natively).
    */
  def readCertificates(path: String): Seq[X509Certificate] = {
    val cf = CertificateFactory.getInstance("X.509")
    val in = new FileInputStream(path)
    try {
      import scala.jdk.CollectionConverters._
      cf.generateCertificates(in).asScala.toSeq.map(_.asInstanceOf[X509Certificate])
    } finally in.close()
  }

  /** Unencrypted PKCS#8 private key from PEM; RSA first, then EC. */
  def readPrivateKey(path: String): java.security.PrivateKey = {
    val pem = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.US_ASCII)
    val b64 = pem.linesIterator.filterNot(_.startsWith("-----")).mkString
    val der = Base64.getDecoder.decode(b64)
    val spec = new PKCS8EncodedKeySpec(der)
    try java.security.KeyFactory.getInstance("RSA").generatePrivate(spec)
    catch {
      case _: Exception => java.security.KeyFactory.getInstance("EC").generatePrivate(spec)
    }
  }

  // ---- contexts ----

  def serverContext(cfg: ServerConfig): SSLContext = {
    val certs = readCertificates(cfg.certificationPath)
    val key = readPrivateKey(cfg.privateKeyPath)
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    ks.setKeyEntry("graft", key, Array.emptyCharArray, certs.toArray)
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, Array.emptyCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  def clientContext(cfg: ClientConfig): SSLContext = {
    val ctx = SSLContext.getInstance("TLS")
    if (cfg.skipCertVerify) {
      val trustAll: X509TrustManager = new X509TrustManager {
        def checkClientTrusted(chain: Array[X509Certificate], authType: String): Unit = ()
        def checkServerTrusted(chain: Array[X509Certificate], authType: String): Unit = ()
        def getAcceptedIssuers: Array[X509Certificate] = Array.empty
      }
      ctx.init(null, Array(trustAll), null)
    } else {
      val tms = cfg.rootCaPath match {
        case Some(path) =>
          val ks = KeyStore.getInstance("PKCS12")
          ks.load(null, null)
          readCertificates(path).zipWithIndex.foreach { case (c, i) => ks.setCertificateEntry(s"ca$i", c) }
          val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
          tmf.init(ks)
          tmf.getTrustManagers
        case None => null // JDK default trust store
      }
      ctx.init(null, tms, null)
    }
    ctx
  }

  // ---- sockets ----

  /** TLS client socket, handshook. Hostname verification is on unless
    * skipCertVerify (matching Go's tls.Config.InsecureSkipVerify scope).
    */
  def clientSocket(host: String, port: Int, cfg: ClientConfig): Socket = {
    val s = clientContext(cfg).getSocketFactory.createSocket(host, port).asInstanceOf[SSLSocket]
    if (!cfg.skipCertVerify) {
      val params = s.getSSLParameters
      params.setEndpointIdentificationAlgorithm("HTTPS")
      s.setSSLParameters(params)
    }
    s.setTcpNoDelay(true)
    try s.startHandshake()
    catch { case e: Throwable => try s.close() catch { case _: Exception => () }; throw e }
    s
  }

  /** Loopback TLS server socket (port 0 = ephemeral), for the in-process
    * brokers.
    */
  def serverSocket(port: Int, cfg: ServerConfig): ServerSocket =
    serverContext(cfg).getServerSocketFactory
      .createServerSocket(port, 50, InetAddress.getLoopbackAddress)
      .asInstanceOf[SSLServerSocket]

  /** Plain or TLS client socket per the optional config. */
  def socket(host: String, port: Int, tls: Option[ClientConfig]): Socket = tls match {
    case Some(cfg) => clientSocket(host, port, cfg)
    case None =>
      val s = new Socket(host, port)
      s.setTcpNoDelay(true)
      s
  }
}
