package graft.config

/** P3 completion — the "remote/watched config beyond a local file" half of
  * the reference's Central Dogma supplier
  * (`centraldogma/.../CentralDogmaPropertySupplier.java:81-344`, which polls
  * a config SERVICE, not a file): a property supplier that polls any
  * fetchable source. The fetch function is the single seam — it returns the
  * full config content plus an opaque version token (ETag, commit revision,
  * object generation, lastModified…), and bound [[DynamicProperty]]s are
  * re-driven only when the version changes, exactly like the file supplier
  * on its mtime.
  *
  * [[RemotePropertySupplier.uri]] builds the fetcher from a URI via
  * `URL.openStream` — one code path serving `file:` (testable offline) and
  * `http(s):`/object-store gateways in a networked deployment; a custom
  * fetcher plugs in anything else (S3 SDK, a config service client) without
  * touching the polling/bind machinery.
  */
final class RemotePropertySupplier(
    fetch: () => Option[(String, String)],
    pollMillis: Long = 1000L)
    extends PollingPropertySupplier(pollMillis, "graft-remote-config-poller") {

  protected def poll(): Option[(String, String)] = fetch()
}

object RemotePropertySupplier {
  /** Poll `uri` with content-hash versioning (no conditional-request support
    * needed from the server; a hash comparison downgrades gracefully to
    * "re-drive only on actual change"). Connect/read timeouts are bounded —
    * URLConnection's defaults are INFINITE, and a hung server would
    * otherwise pin the poller thread forever, silently freezing every bound
    * property for the life of the JVM.
    */
  def uri(
      u: java.net.URI,
      pollMillis: Long = 1000L,
      timeoutMillis: Int = 10000): RemotePropertySupplier =
    new RemotePropertySupplier(() => {
      val conn = u.toURL.openConnection()
      conn.setConnectTimeout(timeoutMillis)
      conn.setReadTimeout(timeoutMillis)
      val in = conn.getInputStream
      try {
        val content = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        val d = java.security.MessageDigest.getInstance("MD5").digest(
          content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        Some((content, d.map(b => f"$b%02x").mkString))
      } finally in.close()
    }, pollMillis)
}
