package graft.nats

import java.io.{FileInputStream, IOException}
import java.net.Socket
import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLSocket, TrustManagerFactory}

/** TLS support for the native wire client and [[MiniNatsServer]].
  *
  * NATS upgrades to TLS AFTER the plaintext INFO line (docs.nats.io,
  * "TLS": the server sends INFO advertising `tls_required`, then both
  * sides run the TLS handshake — the client speaks first with
  * ClientHello, so no server bytes follow INFO until the client
  * initiates). The reference gets this path free from async-nats
  * (Cargo.toml:9 pulls the rustls feature); here it is the standard
  * JSSE layered-socket upgrade.
  *
  * Trust configuration, in precedence order:
  *   1. an explicit [[SSLContext]] handed to [[TcpNatsClient]];
  *   2. the `graft.nats.tls.truststore` system property (path to a
  *      PKCS12 truststore; password in `graft.nats.tls.truststorePassword`,
  *      default "changeit") — the deployment knob for self-signed or
  *      private-CA brokers;
  *   3. the JVM default context (system cacerts) — the public-CA path.
  *
  * Hostname verification is ON (endpoint identification "HTTPS"): a
  * certificate that does not cover the dialed host fails the handshake,
  * as in every official NATS client.
  */
private[nats] object GraftTls {

  /** Client-side SSLContext per the precedence above. */
  def clientContext(explicit: Option[SSLContext]): SSLContext =
    explicit.getOrElse {
      sys.props.get("graft.nats.tls.truststore") match {
        case Some(path) =>
          val pw = sys.props.getOrElse("graft.nats.tls.truststorePassword", "changeit")
          contextFromTruststore(path, pw)
        case None => SSLContext.getDefault
      }
    }

  /** SSLContext trusting exactly the certificates in a PKCS12 truststore. */
  def contextFromTruststore(path: String, password: String): SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    val is = new FileInputStream(path)
    try ks.load(is, password.toCharArray) finally is.close()
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }

  /** Server-side SSLContext from a PKCS12 keystore holding the broker's
    * key + certificate chain. */
  def serverContext(keystorePath: String, password: String): SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    val is = new FileInputStream(keystorePath)
    try ks.load(is, password.toCharArray) finally is.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, password.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** Layer a CLIENT-mode TLS session over an already-connected socket
    * (the post-INFO upgrade) with hostname verification enabled.
    * Throws [[IOException]] with actionable guidance on handshake
    * failure — the certificate/trust mismatch is a configuration
    * problem, and the raw JSSE message doesn't say which knob to turn. */
  def upgradeClient(sock: Socket, host: String, port: Int,
      explicit: Option[SSLContext]): SSLSocket = {
    val ctx = clientContext(explicit)
    val ssl = ctx.getSocketFactory
      .createSocket(sock, host, port, true).asInstanceOf[SSLSocket]
    ssl.setUseClientMode(true)
    val params = ssl.getSSLParameters
    params.setEndpointIdentificationAlgorithm("HTTPS")
    ssl.setSSLParameters(params)
    try { ssl.startHandshake(); ssl }
    catch {
      case e: IOException =>
        try ssl.close() catch { case _: IOException => () }
        throw new IOException(
          s"TLS handshake with NATS server at $host:$port failed " +
            s"(${e.getMessage}). For a self-signed or private-CA broker, " +
            "point -Dgraft.nats.tls.truststore at a PKCS12 truststore " +
            "containing its certificate (password in " +
            "-Dgraft.nats.tls.truststorePassword), or pass an SSLContext " +
            "to TcpNatsClient; the certificate must cover the dialed " +
            "hostname (SAN)", e)
    }
  }

  /** Layer a SERVER-mode TLS session over an accepted socket (the
    * broker's side of the post-INFO upgrade). The handshake runs under a
    * read timeout mirroring the client's 5 s window (ADVICE r13): a peer
    * that connects but never sends ClientHello would otherwise park this
    * connection's thread forever. Cleared again after the handshake —
    * the serving read loop blocks indefinitely by design. */
  def upgradeServer(sock: Socket, ctx: SSLContext): SSLSocket = {
    val prevTimeout = sock.getSoTimeout
    sock.setSoTimeout(5000)
    val ssl = ctx.getSocketFactory
      .createSocket(sock, null, sock.getPort, true).asInstanceOf[SSLSocket]
    ssl.setUseClientMode(false)
    try ssl.startHandshake()
    catch {
      case e: IOException =>
        try ssl.close() catch { case _: IOException => () }
        throw e
    }
    ssl.setSoTimeout(prevTimeout)
    ssl
  }
}
