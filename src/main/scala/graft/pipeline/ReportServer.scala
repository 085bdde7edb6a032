package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** LIVE run browser: serves a report directory over HTTP — the served
  * counterpart of the static [[Pipeline.htmlRunReport]] file, closing
  * the gap to the reference's `dagster dev` run pane
  * (reference `justfile:7-8`, `README.md:71-74`) with zero
  * dependencies: `com.sun.net.httpserver` ships in the JDK.
  *
  * Every request re-reads the file from disk, and an auto-refresh meta
  * tag is injected into HTML responses — re-materializing a pipeline
  * with `htmlReportPath` under `dir` updates every open browser within
  * `refreshSeconds`. `/` lists the directory; any other path serves
  * the file under `dir` (resolved paths escaping `dir` are 404, so the
  * server can't be walked out of its root).
  */
final class ReportServer(dir: String, port: Int = 0, refreshSeconds: Int = 5) {

  private val root = java.nio.file.Paths.get(dir).toAbsolutePath.normalize()
  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))

  /** Bind and serve; returns the bound port (useful with port = 0). */
  def start(): Int = {
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)

  private def handle(ex: HttpExchange): Unit = {
    try {
      val rel = ex.getRequestURI.getPath.stripPrefix("/")
      if (rel.isEmpty) respond(ex, 200, "text/html; charset=utf-8", index())
      else {
        val target = root.resolve(rel).normalize()
        if (!target.startsWith(root) || !java.nio.file.Files.isRegularFile(target))
          respond(ex, 404, "text/plain; charset=utf-8",
            "not found".getBytes(UTF_8))
        else {
          val bytes = java.nio.file.Files.readAllBytes(target)
          val name = target.getFileName.toString
          if (name.endsWith(".html"))
            respond(ex, 200, "text/html; charset=utf-8", withRefresh(bytes))
          else if (name.endsWith(".json"))
            respond(ex, 200, "application/json", bytes)
          else respond(ex, 200, "text/plain; charset=utf-8", bytes)
        }
      }
    } finally ex.close()
  }

  /** Inject `<meta http-equiv=refresh>` right after `<head>` so served
    * pages self-update; pages without a head tag pass through as-is.
    */
  private def withRefresh(html: Array[Byte]): Array[Byte] = {
    val s = new String(html, UTF_8)
    val tag = s"""<meta http-equiv="refresh" content="$refreshSeconds">"""
    val i = s.indexOf("<head>")
    if (i < 0) html
    else (s.substring(0, i + 6) + tag + s.substring(i + 6)).getBytes(UTF_8)
  }

  private def index(): Array[Byte] = {
    val files =
      if (!java.nio.file.Files.isDirectory(root)) Seq.empty
      else {
        val st = java.nio.file.Files.list(root)
        try {
          import scala.jdk.CollectionConverters._
          st.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
            .map(_.getFileName.toString).toSeq.sorted
        } finally st.close()
      }
    val items = files.map(f => s"""<li><a href="$f">$f</a></li>""")
      .mkString("\n")
    (s"""<!DOCTYPE html><html><head><meta charset="utf-8">""" +
      s"""<meta http-equiv="refresh" content="$refreshSeconds">""" +
      s"""<title>graft reports</title></head><body><h1>graft reports</h1>""" +
      s"""<ul>$items</ul></body></html>""").getBytes(UTF_8)
  }

  private def respond(ex: HttpExchange, code: Int, ctype: String,
      body: Array[Byte]): Unit = {
    ex.getResponseHeaders.set("Content-Type", ctype)
    ex.sendResponseHeaders(code, body.length.toLong)
    val os = ex.getResponseBody
    try os.write(body) finally os.close()
  }
}
