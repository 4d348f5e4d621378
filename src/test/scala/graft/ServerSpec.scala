package graft

import graft.sources.GraphStore
import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket

/** Wire-protocol coverage for [[Server]]: real sockets against an
  * ephemeral in-process endpoint over the modern graph — the same
  * accept/serve path the standalone main runs. */
class ServerSpec extends SparkSpec {

  private lazy val server =
    Server.start(GraphStore.modern(spark), port = 0)

  private def connect(): (Socket, BufferedReader, PrintWriter) = {
    val s = new Socket("localhost", server.getLocalPort)
    (s,
      new BufferedReader(new InputStreamReader(s.getInputStream, "UTF-8")),
      new PrintWriter(
        new java.io.OutputStreamWriter(s.getOutputStream, "UTF-8"), false))
  }

  private def roundTrip(in: BufferedReader, out: PrintWriter,
                        q: String): Seq[String] = {
    out.println(q); out.flush()
    Iterator.continually(in.readLine())
      .takeWhile(l => l != null && l != "#done").toSeq
  }

  test("query, DDL, pool, and error round-trips on one connection") {
    val (sock, in, out) = connect()
    try {
      assert(roundTrip(in, out, "g.V().count()") == Seq("=>6"))
      assert(roundTrip(in, out, "g.V().has('name','marko').values('age')")
        == Seq("=>29"))
      // DDL replies with a status line
      val ddl = roundTrip(in, out, "BuildIndex(V, 'name')")
      assert(ddl.size == 1 && ddl.head.startsWith("=>"))
      // #pool returns the distinct property values
      val pool = roundTrip(in, out, "#pool lang").map(_.stripPrefix("=>"))
      assert(pool.toSet == Set("java"))
      // malformed queries answer ERROR, and the connection survives
      val err = roundTrip(in, out, "not a query (((")
      assert(err.size == 1 && err.head.startsWith("ERROR"))
      assert(roundTrip(in, out, "g.E().count()") == Seq("=>6"))
    } finally sock.close()
  }

  test("concurrent connections all serve correct results") {
    val errors = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        val (sock, in, out) = connect()
        try {
          (1 to 5).foreach { _ =>
            if (roundTrip(in, out, "g.V().hasLabel('person').count()")
                != Seq("=>4")) errors.incrementAndGet()
          }
        } catch { case _: Throwable => errors.incrementAndGet() }
        finally sock.close()
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errors.get() == 0)
  }

  override def afterAll(): Unit = {
    server.close()
    super.afterAll()
  }
}
