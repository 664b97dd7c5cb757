package graft.config

import java.net.Socket

/** Bidirectional byte splice between two sockets — the relay primitive
  * under the tunnel verb (`/root/reference/cli/cli/tunnel_command.go:22`
  * plus the vendored `cli/chisel/` client: the reference forwards a
  * local port to a control-plane-resolved target over a WebSocket
  * tunnel; the rebuild's plane and CLI live on the same network plane,
  * so a plain TCP splice with a one-line preamble plays chisel's role —
  * WebSocket framing buys nothing here).
  *
  * The CALLER's thread pumps a→b (so a CLI accept handler naturally
  * blocks for the connection's lifetime); a daemon thread pumps b→a.
  * Either side's EOF or error closes both sockets, ending both pumps.
  */
private[graft] object TcpRelay {

  def splice(a: Socket, b: Socket): Unit = {
    val back = new Thread(() => pump(b, a), "graft-tunnel-pump")
    back.setDaemon(true)
    back.start()
    pump(a, b)
    // wait for the reverse pump to drain its final bytes
    back.join(5000L)
  }

  private def pump(from: Socket, to: Socket): Unit = {
    val buf = new Array[Byte](1 << 16)
    try {
      val in = from.getInputStream
      val out = to.getOutputStream
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) { out.write(buf, 0, n); out.flush() }
        n = in.read(buf)
      }
    } catch { case _: Exception => () }
    finally {
      // closing both ends releases the peer pump's blocking read
      try from.close() catch { case _: Exception => () }
      try to.close() catch { case _: Exception => () }
    }
  }
}
