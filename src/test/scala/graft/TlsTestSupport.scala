package graft

import java.io.File
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/** Shared TLS test fixture: one self-signed PKCS12 is both the server
  * identity and the trust anchor for client certs — riemann's
  * less-awful-ssl key/cert/ca-cert trio collapsed to a test triple.
  * Used by RiemannServerSpec (raw server) and MainSpec (packaged
  * process); keystore params live HERE only. */
object TlsTestSupport {
  val Password = "changeit"

  lazy val keystore: File = {
    val ks = new File("/tmp/graft_tls_test.p12")
    if (!ks.exists()) {
      val cmd = Seq("keytool", "-genkeypair", "-alias", "graft",
        "-keyalg", "RSA", "-keysize", "2048", "-validity", "3650",
        "-storetype", "PKCS12", "-keystore", ks.getPath,
        "-storepass", Password, "-keypass", Password,
        "-dname", "CN=localhost")
      require(new ProcessBuilder(cmd: _*).inheritIO().start().waitFor() == 0,
        "keytool keystore generation failed")
    }
    ks
  }

  /** A client context presenting the trusted cert and trusting the
    * server's. */
  def clientContext(): SSLContext = {
    val store = java.security.KeyStore.getInstance("PKCS12")
    val in = new java.io.FileInputStream(keystore)
    try store.load(in, Password.toCharArray) finally in.close()
    val kmf = KeyManagerFactory.getInstance(
      KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(store, Password.toCharArray)
    val tmf = TrustManagerFactory.getInstance(
      TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(store)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tmf.getTrustManagers, null)
    ctx
  }
}
