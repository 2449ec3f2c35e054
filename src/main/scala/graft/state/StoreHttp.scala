package graft.state

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** Interactive queries over registered stores — the reference's REST
  * surface (`/root/reference/kstream/store/http.go:120-399`):
  *
  *   GET /stores                      → store names
  *   GET /indexes                     → all (store, index) pairs
  *   GET /stores/{s}?limit=N          → scan (default 1000 rows)
  *   GET /stores/{s}/{key}            → point lookup on the store's key
  *   GET /stores/{s}/indexes          → the store's index names
  *   GET /stores/{s}/indexes/{i}/{k}  → secondary-index lookup (A5)
  *   GET /meta                        → store→host discovery (meta.go analog)
  *
  * Rows render via `Dataset.toJSON` (schema-faithful JSON). Point lookups
  * run as pushed-down predicates against the snapshot — the driver only
  * collects the matching rows, so the surface works unchanged whether the
  * snapshot is 100 rows or 100 TB of partitioned parquet. Built on the
  * JDK's HttpServer: no dependencies, ephemeral port for tests.
  *
  * The HTTP layer is the one legitimately driver-side collect in the
  * engine, so the caller-controlled `limit` query param is clamped to
  * `maxScanLimit` — `?limit=2000000000` must not pull a whole store onto
  * the driver.
  */
final class StoreHttp(
    registry: StoreRegistry, port: Int = 0, maxScanLimit: Int = 10000) {

  private var server: HttpServer = _

  /** index name → (store name, index expression column name builder) */
  private val indexes = scala.collection.concurrent.TrieMap
    .empty[(String, String), org.apache.spark.sql.Column]

  def registerIndex(store: String, indexName: String, expr: org.apache.spark.sql.Column): Unit =
    indexes.put((store, indexName), expr)

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/stores", (ex: HttpExchange) => handle(ex))
    server.createContext("/indexes", (ex: HttpExchange) => handle(ex))
    server.createContext("/meta", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  /** JSON string escape — quotes/backslashes/control chars in an error
    * message (easy via a store or SQL failure) must not break the payload.
    */
  private def jstr(s: String): String = "\"" + Option(s).getOrElse("null").flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  import StoreHttp.NotFound

  private def handle(ex: HttpExchange): Unit = {
    val resp =
      try route(ex)
      catch {
        case NotFound(m)  => (404, s"""{"error":${jstr(m)}}""")
        case e: Throwable => (500, s"""{"error":${jstr(e.getMessage)}}""")
      }
    val bytes = resp._2.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(resp._1, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def route(ex: HttpExchange): (Int, String) = {
    val parts = ex.getRequestURI.getPath.stripPrefix("/").split("/").toList
    val limit = Option(ex.getRequestURI.getQuery)
      .flatMap(_.split("&").collectFirst {
        case q if q.startsWith("limit=") => q.stripPrefix("limit=").toInt
      }).getOrElse(1000)
      .max(0).min(maxScanLimit)
    def storeOr404(s: String): DataFrame =
      if (registry.storeNames.contains(s)) registry.store(s)
      else throw NotFound(s"unknown store $s")
    parts match {
      case "meta" :: Nil =>
        // host-metadata discovery (`kstream/store/meta.go:10-81`): the
        // reference maps each `topic_partition` to the consumer-group
        // member hosting it so a router can forward interactive queries.
        // (Dead code there — never wired into http.go — implemented here
        // for surface parity.) Single-process Spark serves EVERY store
        // from this authority, so each store renders one entry keyed in
        // the reference's `%s_%d` format with partition 0.
        val a = server.getAddress
        val host = jstr(s"${a.getHostString}:${a.getPort}")
        (200, registry.storeNames
          .map(n => s"""{"tp":${jstr(n + "_0")},"host":$host}""")
          .mkString("[", ",", "]"))
      case "stores" :: Nil =>
        (200, registry.storeNames.map(n => s""""$n"""").mkString("[", ",", "]"))
      case "indexes" :: Nil => // store/http.go GET /indexes
        (200, indexes.keys.toSeq.sorted
          .map { case (s, i) => s"""{"store":${jstr(s)},"index":${jstr(i)}}""" }
          .mkString("[", ",", "]"))
      case "stores" :: s :: "indexes" :: Nil =>
        val _ = storeOr404(s)
        (200, indexes.keys.collect { case (`s`, i) => jstr(i) }
          .toSeq.sorted.mkString("[", ",", "]"))
      case "stores" :: s :: Nil =>
        (200, rows(storeOr404(s).limit(limit)))
      case "stores" :: s :: key :: Nil =>
        val df = storeOr404(s)
        (200, rows(df.filter(col(registry.keyOf(s)) === lit(key)
          .cast(df.schema(registry.keyOf(s)).dataType))))
      case "stores" :: s :: "indexes" :: i :: key :: Nil =>
        val df = storeOr404(s)
        val expr = indexes.getOrElse((s, i), throw NotFound(s"unknown index $i"))
        (200, rows(df.filter(expr.cast("string") === key).limit(limit)))
      case _ => (404, """{"error":"not found"}""")
    }
  }

  private def rows(df: DataFrame): String =
    df.toJSON.collect().mkString("[", ",", "]")
}

object StoreHttp {
  /** Unknown store/index → 404; anything else is an internal failure. */
  private final case class NotFound(msg: String) extends RuntimeException(msg)
}
