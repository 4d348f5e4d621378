package graft

import graft.sources.GraphStore
import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket

/** Wire-protocol coverage for [[Dispatcher]]: two in-process [[Server]]
  * backends (each with its own Graft over the modern graph), a real
  * dispatcher socket in front, clients speaking the unchanged
  * protocol. Asserts answer parity with a direct server, DDL
  * broadcast, least-loaded spread, and error transparency. */
class DispatcherSpec extends SparkSpec {

  private lazy val backendA =
    Server.start(GraphStore.modern(spark), port = 0)
  private lazy val backendB =
    Server.start(GraphStore.modern(spark), port = 0)
  private lazy val (front, routed) = Dispatcher.start(
    Seq(("localhost", backendA.getLocalPort),
      ("localhost", backendB.getLocalPort)), port = 0)

  private def connect(port: Int): (Socket, BufferedReader, PrintWriter) = {
    val s = new Socket("localhost", port)
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

  test("dispatched queries answer exactly like a direct server") {
    val (sock, in, out) = connect(front.getLocalPort)
    try {
      assert(roundTrip(in, out, "g.V().count()") == Seq("=>6"))
      assert(roundTrip(in, out, "g.V().has('name','marko').values('age')")
        == Seq("=>29"))
      // DDL broadcasts: one status block relayed, every backend indexed
      val ddl = roundTrip(in, out, "BuildIndex(V, 'name')")
      assert(ddl.size == 1 && ddl.head.startsWith("=>"))
      // #pool routes like a query
      val pool = roundTrip(in, out, "#pool lang").map(_.stripPrefix("=>"))
      assert(pool.toSet == Set("java"))
      // errors relay transparently and the connection survives
      val err = roundTrip(in, out, "not a query (((")
      assert(err.size == 1 && err.head.startsWith("ERROR"))
      assert(roundTrip(in, out, "g.E().count()") == Seq("=>6"))
    } finally sock.close()
  }

  test("concurrent load spreads across both backends, zero errors") {
    val before = routed.map(_.get())
    val errors = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        val (sock, in, out) = connect(front.getLocalPort)
        try {
          (1 to 6).foreach { _ =>
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
    val delta = routed.map(_.get()).zip(before).map { case (a, b) => a - b }
    assert(delta.sum == 48, delta.mkString(","))
    // least-loaded routing must use BOTH backends under concurrency
    assert(delta.forall(_ > 0), s"one-sided routing: ${delta.mkString(",")}")
  }

  test("backend crash mid-response: dropped from rotation, rerouted, " +
      "zero client-visible errors") {
    // flaky fake backend: answers the startup probe, serves 2 queries
    // per connection, then crashes MID-RESPONSE on the 3rd (a result
    // line with no #done, socket closed) — the worst failover case,
    // because a naive relay would have already leaked partial output
    val flaky = new java.net.ServerSocket(0)
    val acceptor = new Thread(() => {
      try while (true) {
        val s = flaky.accept()
        val t = new Thread(() => {
          val in = new BufferedReader(
            new InputStreamReader(s.getInputStream, "UTF-8"))
          val out = new PrintWriter(new java.io.OutputStreamWriter(
            s.getOutputStream, "UTF-8"), false)
          var served = 0
          try {
            var line = in.readLine()
            var run = true
            while (run && line != null) {
              if (line == "exit" || line == "quit") run = false
              else if (line.startsWith("#pool")) {
                out.println("=>probe"); out.println("#done"); out.flush()
                line = in.readLine()
              } else {
                served += 1
                if (served >= 3) {
                  out.println("=>6"); out.flush() // partial block, then die
                  s.close(); run = false
                } else {
                  out.println("=>6"); out.println("#done"); out.flush()
                  line = in.readLine()
                }
              }
            }
          } catch { case _: Throwable => () }
          finally { try s.close() catch { case _: Throwable => () } }
        })
        t.setDaemon(true); t.start()
      } catch { case _: java.io.IOException => () }
    })
    acceptor.setDaemon(true); acceptor.start()

    val (front2, routed2) = Dispatcher.start(
      Seq(("localhost", flaky.getLocalPort),
        ("localhost", backendA.getLocalPort)), port = 0)
    val (sock, in, out) = connect(front2.getLocalPort)
    try {
      // a sequential client ties on in-flight → routes to backend 0
      // (the flaky one) until it dies; every answer must stay correct
      // and single — no duplicated partial line, no ERROR
      (1 to 6).foreach { k =>
        assert(roundTrip(in, out, "g.V().count()") == Seq("=>6"),
          s"query $k")
      }
      assert(routed2(0).get() == 2,
        s"flaky completed ${routed2(0).get()} before dying")
      assert(routed2(1).get() == 4, "crashed + later queries reroute")
      // a NEW connection must skip the dead backend (global liveness)
      val (s2, in2, out2) = connect(front2.getLocalPort)
      try assert(roundTrip(in2, out2, "g.V().count()") == Seq("=>6"))
      finally s2.close()
      assert(routed2(1).get() == 5, "survivor serves new connections")
    } finally {
      sock.close(); front2.close(); flaky.close()
    }
  }
}
