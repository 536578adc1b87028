package graft

/** Shared TLS material for the riemann wire (server listener and
  * forward client): a PKCS12 keystore carrying the local key + cert,
  * and an optional separate truststore anchoring peer verification —
  * riemann's less-awful-ssl key/cert/ca-cert trio
  * (src/riemann/transport/tcp.clj tls? path) collapsed to JDK
  * keystores. */
case class TlsFiles(keystore: String, password: String,
    truststore: Option[String] = None, clientAuth: Boolean = false) {
  def context(): javax.net.ssl.SSLContext = {
    import javax.net.ssl._
    def load(path: String): java.security.KeyStore = {
      val ks = java.security.KeyStore.getInstance("PKCS12")
      val in = new java.io.FileInputStream(path)
      try ks.load(in, password.toCharArray) finally in.close()
      ks
    }
    val kmf = KeyManagerFactory.getInstance(
      KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(load(keystore), password.toCharArray)
    val tmf = TrustManagerFactory.getInstance(
      TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(load(truststore.getOrElse(keystore)))
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tmf.getTrustManagers, null)
    ctx
  }
}
