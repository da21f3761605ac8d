package graft.report

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter, Writer}
import java.net.Socket
import java.nio.charset.StandardCharsets

/** Minimal socket-level SMTP client (RFC 5321) behind `Reporting.Sender` —
  * the production transport the reference reaches through smtplib
  * (`advanced_monitoring.py:366-371`: connect → hello → send → quit). No
  * mail library: the dialogue is five commands over a TCP socket. TLS/auth
  * are deployment concerns layered via `socketFactory` (a production
  * deployment hands an SSL socket factory + pre-auth hook); the protocol
  * exchange below is what every layer speaks.
  */
object Smtp {

  /** One SMTP reply: 3-digit code + joined text lines. */
  final case class Reply(code: Int, text: String)

  final class SmtpException(msg: String) extends RuntimeException(msg)

  /** Default factory: connect + read timeouts, so a blackholed or wedged
    * MTA fails the notification instead of hanging the scheduler run. */
  private def connectWithTimeout(timeoutMs: Int)(host: String, port: Int): Socket = {
    val s = new Socket()
    s.connect(new java.net.InetSocketAddress(host, port), timeoutMs)
    s.setSoTimeout(timeoutMs)
    s
  }

  /** Header/envelope injection guard: addresses and subjects are data, not
    * protocol — fold any CR/LF (+ a stray leading dot-line chance is handled
    * by body dot-stuffing) into spaces before interpolating into commands
    * or RFC 5322 headers. */
  private def oneLine(v: String): String =
    v.replaceAll("[\\r\\n]+", " ")

  final class SmtpSender(host: String, port: Int, from: String,
      socketFactory: (String, Int) => Socket = null,
      timeoutMs: Int = 30000)
      extends Reporting.Sender {

    private val factory: (String, Int) => Socket =
      Option(socketFactory).getOrElse(connectWithTimeout(timeoutMs))

    def send(to0: String, subject0: String, body: String): Unit = {
      val to = oneLine(to0)
      val subject = oneLine(subject0)
      val sock = factory(host, port)
      try {
        val in = new BufferedReader(
          new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
        val out = new OutputStreamWriter(
          sock.getOutputStream, StandardCharsets.UTF_8)
        expect(in, 220, "greeting")
        command(out, in, s"EHLO graft.local", 250)
        command(out, in, s"MAIL FROM:<${oneLine(from)}>", 250)
        command(out, in, s"RCPT TO:<$to>", 250)
        command(out, in, "DATA", 354)
        out.write(message(to, subject, body))
        out.write(".\r\n")
        out.flush()
        expect(in, 250, "message accept")
        command(out, in, "QUIT", 221)
      } finally sock.close()
    }

    /** RFC 5322 payload: headers, blank line, dot-stuffed CRLF body.
      * Callers pass `to`/`subject` already CR/LF-folded. */
    private[report] def message(to: String, subject: String, body: String): String = {
      val headers = Seq(
        s"From: ${oneLine(from)}", s"To: $to", s"Subject: $subject",
        "MIME-Version: 1.0", "Content-Type: text/plain; charset=utf-8")
      val stuffed = body.split("\n", -1).map { line =>
        val l = line.stripSuffix("\r")
        if (l.startsWith(".")) "." + l else l // RFC 5321 §4.5.2 dot-stuffing
      }
      (headers ++ Seq("") ++ stuffed).mkString("", "\r\n", "\r\n")
    }

    private def command(out: Writer, in: BufferedReader, cmd: String,
        want: Int): Reply = {
      out.write(cmd + "\r\n")
      out.flush()
      expect(in, want, cmd.takeWhile(_ != ':'))
    }

    /** Read one (possibly multiline `NNN-`) reply and require `want`. */
    private def expect(in: BufferedReader, want: Int, phase: String): Reply = {
      val lines = scala.collection.mutable.ArrayBuffer.empty[String]
      var terminal = false
      var eof = false
      while (!terminal && !eof) {
        val line = in.readLine()
        if (line == null) eof = true
        else {
          lines += line
          // continuation lines are `NNN-text`; the final line is `NNN text`
          terminal = !(line.length >= 4 && line.charAt(3) == '-')
        }
      }
      // a reply is only complete once a terminal `NNN<space>` line arrives —
      // EOF after a `NNN-` continuation is a truncated reply, not a success
      if (!terminal)
        throw new SmtpException(
          if (lines.isEmpty) s"$phase: connection closed"
          else s"$phase: connection closed mid-reply")
      val code = lines.last.take(3).toIntOption.getOrElse(-1)
      val reply = Reply(code, lines.map(_.drop(4)).mkString("\n"))
      if (code != want)
        throw new SmtpException(s"$phase: expected $want got ${reply.code} ${reply.text}")
      reply
    }
  }
}
