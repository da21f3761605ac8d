package graft.report

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** In-process stub SMTP server: speaks just enough RFC 5321 to drive
  * `Smtp.SmtpSender` through a full session and record what arrived. */
class SmtpSpec extends AnyFunSuite {

  private final class StubServer(failRcpt: Boolean = false) {
    val server = new ServerSocket(0) // ephemeral port, no external surface
    val commands = new java.util.concurrent.CopyOnWriteArrayList[String]()
    @volatile var data: String = ""
    val thread = new Thread(() => {
      val sock = server.accept()
      val in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      val out = new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8)
      def reply(s: String): Unit = { out.write(s + "\r\n"); out.flush() }
      reply("220 stub ESMTP")
      var open = true
      while (open) {
        val line = in.readLine()
        if (line == null) open = false
        else {
          commands.add(line)
          val up = line.toUpperCase
          if (up.startsWith("EHLO")) {
            // multiline reply: the client must consume 250- continuations
            out.write("250-stub greets you\r\n250-SIZE 1000000\r\n")
            reply("250 OK")
          } else if (up.startsWith("MAIL FROM")) reply("250 OK")
          else if (up.startsWith("RCPT TO"))
            reply(if (failRcpt) "550 no such user" else "250 OK")
          else if (up == "DATA") {
            reply("354 go ahead")
            val sb = new StringBuilder
            var dot = false
            while (!dot) {
              val l = in.readLine()
              if (l == null || l == ".") dot = true
              else sb.append(l).append("\r\n")
            }
            data = sb.toString
            reply("250 accepted")
          } else if (up == "QUIT") { reply("221 bye"); open = false }
          else reply("250 OK")
        }
      }
      sock.close()
    })
    thread.start()
    def port: Int = server.getLocalPort
    def close(): Unit = { thread.join(5000); server.close() }
  }

  test("full session: EHLO/MAIL/RCPT/DATA/QUIT with RFC-shaped payload") {
    val stub = new StubServer()
    val sender = new Smtp.SmtpSender("127.0.0.1", stub.port, "etl@example.invalid")
    new Reporting.EmailNotifier(sender, "ops@example.invalid")
      .notifyRun("line one\n.starts with dot\nline three", ok = true)
    stub.close()

    val cmds = stub.commands.toArray.map(_.toString)
    assert(cmds.exists(_.startsWith("EHLO ")), "client must EHLO first")
    assert(cmds.contains("MAIL FROM:<etl@example.invalid>"))
    assert(cmds.contains("RCPT TO:<ops@example.invalid>"))
    assert(cmds.contains("DATA") && cmds.contains("QUIT"))
    // envelope order: EHLO < MAIL < RCPT < DATA
    val order = Seq("EHLO", "MAIL", "RCPT", "DATA")
      .map(p => cmds.indexWhere(_.toUpperCase.startsWith(p)))
    assert(order == order.sorted && order.forall(_ >= 0), s"order: $cmds")

    assert(stub.data.contains("From: etl@example.invalid\r\n"))
    assert(stub.data.contains("To: ops@example.invalid\r\n"))
    assert(stub.data.contains("Subject: Monday ETL: run OK\r\n"))
    assert(stub.data.contains("\r\n\r\nline one\r\n"), "blank line before body")
    // dot-stuffing applied on the wire (stub records raw lines pre-unstuff)
    assert(stub.data.contains("\r\n..starts with dot\r\n"))
    assert(stub.data.contains("line three"))
  }

  test("CR/LF in addresses and subjects is folded: no header or envelope injection") {
    val stub = new StubServer()
    val sender = new Smtp.SmtpSender("127.0.0.1", stub.port, "etl@example.invalid")
    sender.send("victim@example.invalid>\r\nRCPT TO:<evil@example.invalid",
      "Run OK\r\nBcc: attacker@example.invalid", "body")
    stub.close()
    val cmds = stub.commands.toArray.map(_.toString)
    // the CR/LF fold keeps the hostile text INSIDE one command/header as
    // inert data — what must never happen is a separate protocol line
    assert(cmds.count(_.toUpperCase.startsWith("RCPT TO")) == 1,
      s"injected envelope command leaked as its own line: ${cmds.toSeq}")
    assert(!stub.data.contains("\r\nBcc:"), "injected header leaked as its own line")
    assert(stub.data.contains("Subject: Run OK Bcc: attacker@example.invalid\r\n"),
      "folded subject keeps the text as inert data")
  }

  test("a rejected RCPT raises instead of silently dropping the mail") {
    val stub = new StubServer(failRcpt = true)
    val sender = new Smtp.SmtpSender("127.0.0.1", stub.port, "etl@example.invalid")
    val e = intercept[Smtp.SmtpException] {
      sender.send("nobody@example.invalid", "s", "b")
    }
    assert(e.getMessage.contains("550"))
    stub.server.close()
  }
}
