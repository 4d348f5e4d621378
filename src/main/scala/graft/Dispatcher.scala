package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}
import scala.collection.mutable.ArrayBuffer

/**
 * Master-style query dispatcher — the Spark rendering of the
 * reference master's least-loaded scheduling (`driver/master.hpp:54-86`:
 * a progress map of in-flight queries per worker and a `ProgScheduler`
 * that assigns each incoming query to the emptiest one), completing
 * the client/master/worker serving split: clients speak the SAME
 * line protocol to the dispatcher that they speak to a single
 * [[Server]], and each QUERY (not each connection) is routed to the
 * backend JVM with the fewest in-flight queries. Multiple serving
 * JVMs scale the query-concurrency dimension — each holds its own
 * cached graph + indexes, like the reference's per-worker stores.
 *
 *   sbt "runMain graft.Server /root/testdata/sf0.01 9181"   # JVM 1
 *   sbt "runMain graft.Server /root/testdata/sf0.01 9182"   # JVM 2
 *   sbt "runMain graft.Dispatcher 9180 localhost:9181 localhost:9182"
 *   sbt "runMain graft.NetEmu localhost 9180 32 200"
 *
 * Routing rules (master.hpp parity, adapted to our DDL):
 *  - Gremlin queries and `#pool` go to the least-loaded LIVE backend
 *    (global in-flight counters, the progress map).
 *  - DDL (`BuildIndex`, `SetConfig`) BROADCASTS to every live
 *    backend — index/config state must agree on all workers; the
 *    first backend's response block is relayed, the rest are drained.
 *  - `exit`/`quit`/EOF closes the client's backend connections.
 *
 * Failover (master parity — the reference re-picks a worker per query
 * from whoever is alive, never routing to a dead one): a backend that
 * fails mid-query is marked dead GLOBALLY and dropped from rotation
 * for every connection; the in-flight query is re-routed to a
 * surviving backend. Relay is exactly-once — a backend's response
 * block is buffered until its `#done` arrives, so a mid-response
 * crash re-runs the query on a survivor without duplicating partial
 * output to the client. Only when NO backend survives does the client
 * see an `ERROR` line.
 *
 * Each client connection opens one socket per backend LAZILY (first
 * query routed there; the protocol is in-order per connection), so
 * per-query routing costs no connection setup and dead backends cost
 * nothing; concurrency across clients is what the in-flight counters
 * balance. Prints `LISTENING <port>` when every backend answered a
 * probe and the socket is bound.
 */
object Dispatcher {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: Dispatcher <listenPort> <host:port> [<host:port> ...]")
    val port = args(0).toInt
    val backends = args.drop(1).toSeq.map { hp =>
      val Array(h, p) = hp.split(":")
      (h, p.toInt)
    }
    val (server, _) = start(backends, port)
    println(s"LISTENING ${server.getLocalPort}")
    Thread.currentThread().join()
  }

  /** Bind and serve; returns the socket and the per-backend ROUTED
    * counters (total queries routed to each backend — tests assert
    * the balance). Backends are probed with one no-op round-trip so a
    * dead address fails fast here, not on the first client. */
  def start(backends: Seq[(String, Int)],
            port: Int): (ServerSocket, Array[AtomicInteger]) = {
    backends.foreach { case (h, p) =>
      val s = new Socket(h, p)
      try {
        val out = new PrintWriter(new java.io.OutputStreamWriter(
          s.getOutputStream, "UTF-8"), false)
        val in = new BufferedReader(
          new InputStreamReader(s.getInputStream, "UTF-8"))
        out.println("#pool __probe__"); out.flush()
        var l = in.readLine()
        while (l != null && l != "#done") l = in.readLine()
        out.println("exit"); out.flush()
      } finally s.close()
    }
    val inflight = Array.fill(backends.length)(new AtomicInteger(0))
    val routed = Array.fill(backends.length)(new AtomicInteger(0))
    val alive = Array.fill(backends.length)(new AtomicBoolean(true))
    val server = new ServerSocket(port)
    val acceptor = new Thread(() => {
      try while (true) {
        val sock = server.accept()
        val t = new Thread(() =>
          serve(sock, backends, inflight, routed, alive))
        t.setDaemon(true)
        t.start()
      } catch { case _: java.io.IOException => () }
    }, "graft-dispatch-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()
    (server, routed)
  }

  private def isDdl(q: String): Boolean =
    q.startsWith("BuildIndex") || q.startsWith("SetConfig")

  private def serve(client: Socket, backends: Seq[(String, Int)],
                    inflight: Array[AtomicInteger],
                    routed: Array[AtomicInteger],
                    alive: Array[AtomicBoolean]): Unit = {
    val cin = new BufferedReader(
      new InputStreamReader(client.getInputStream, "UTF-8"))
    val cout = new PrintWriter(new java.io.OutputStreamWriter(
      client.getOutputStream, "UTF-8"), false)
    val socks =
      Array.fill[Option[(Socket, BufferedReader, PrintWriter)]](
        backends.length)(None)
    def conn(i: Int): (Socket, BufferedReader, PrintWriter) =
      socks(i).getOrElse {
        val (h, p) = backends(i)
        val s = new Socket(h, p) // throws IOException if unreachable
        s.setTcpNoDelay(true)
        val c = (s, new BufferedReader(
          new InputStreamReader(s.getInputStream, "UTF-8")),
          new PrintWriter(new java.io.OutputStreamWriter(
            s.getOutputStream, "UTF-8"), false))
        socks(i) = Some(c)
        c
      }
    def markDead(i: Int): Unit = {
      alive(i).set(false)
      socks(i).foreach { case (s, _, _) =>
        try s.close() catch { case _: Throwable => () } }
      socks(i) = None
    }
    // forward one query to backend `i`, returning its BUFFERED
    // response block — nothing reaches the client until the backend's
    // `#done` proves the block complete (exactly-once under failover)
    def forward(i: Int, q: String): Seq[String] = {
      val (_, bin, bout) = conn(i)
      bout.println(q); bout.flush()
      if (bout.checkError()) // PrintWriter swallows IOExceptions
        throw new java.io.IOException(s"backend $i write failed")
      val buf = new ArrayBuffer[String]()
      var l = bin.readLine()
      while (l != null && l != "#done") { buf += l; l = bin.readLine() }
      if (l == null) throw new java.io.IOException(s"backend $i closed")
      buf.toSeq
    }
    def liveIdx: Seq[Int] = backends.indices.filter(alive(_).get())
    // the progress map: route to the emptiest live backend; a failed
    // backend is dropped from rotation and the query re-routed
    def route(q: String): Unit = {
      var done = false
      while (!done) {
        val cand = liveIdx
        if (cand.isEmpty) {
          cout.println("ERROR: no live backends"); done = true
        } else {
          val i = cand.minBy(j => (inflight(j).get(), j))
          inflight(i).incrementAndGet()
          val res =
            try Some(forward(i, q))
            catch { case _: java.io.IOException => None }
            finally inflight(i).decrementAndGet()
          res match {
            case Some(lines) =>
              lines.foreach(cout.println)
              routed(i).incrementAndGet()
              done = true
            case None => markDead(i)
          }
        }
      }
    }
    def routeDdl(q: String): Unit = {
      var relayed = false
      liveIdx.foreach { i =>
        try {
          val lines = forward(i, q)
          if (!relayed) { lines.foreach(cout.println); relayed = true }
        } catch { case _: java.io.IOException => markDead(i) }
      }
      if (!relayed) cout.println("ERROR: no live backends")
    }
    try {
      var line = cin.readLine()
      while (line != null) {
        val q = line.trim
        if (q == "exit" || q == "quit") line = null
        else {
          if (q.nonEmpty) {
            if (isDdl(q)) routeDdl(q) else route(q)
          }
          cout.println("#done")
          cout.flush()
          line = cin.readLine()
        }
      }
    } catch { case _: java.io.IOException => () }
    finally {
      socks.flatten.foreach { case (s, _, out) =>
        try { out.println("exit"); out.flush() } catch { case _: Throwable => () }
        try s.close() catch { case _: Throwable => () }
      }
      try client.close() catch { case _: Throwable => () }
    }
  }
}
