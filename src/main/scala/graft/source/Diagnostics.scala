package graft.source

import java.nio.file.{Files, Paths}

/** Staged diagnostic harness — the `etl_debug.py:281-317` analog: four gated
  * stages (API auth → board access → subitem extraction → fix-and-reload),
  * each run only if the previous gate passed. Stages 1-3 short-circuit the
  * run on failure exactly like the reference's early `return`s; stage 4's
  * failure is reported but does not abort (the reference prints "Fix
  * fallito" and still completes).
  */
object Diagnostics {

  final case class StageResult(stage: String, ok: Boolean, detail: String)

  /** The four stage names, in gate order. */
  val Stages: Seq[String] = Seq("api", "board", "subitems", "reload")

  final class Runner(client: MondayClient, boardId: String) {

    /** Run the gated pipeline; `reload` is the fix-and-load seam fed with
      * the paginated page bodies (ref `etl_debug.py:222-279`). Returns one
      * result per stage REACHED — a short list is a short-circuited run. */
    def run(reload: Seq[String] => Boolean): Seq[StageResult] = {
      val results = Seq.newBuilder[StageResult]
      var gateOpen = true

      def gated(stage: String)(body: => String): Unit = if (gateOpen) {
        val r =
          try StageResult(stage, ok = true, body)
          catch { case e: Throwable =>
            StageResult(stage, ok = false,
              Option(e.getMessage).getOrElse(e.getClass.getName))
          }
        results += r
        if (!r.ok) gateOpen = false
      }

      gated("api") {
        client.apiCall("query { me { name email } }")
        "API reachable"
      }
      gated("board") {
        val resp = client.apiCall(
          MondayQueries.itemsPageQuery(boardId, 100, None))
        val items = resp.path("data").path("boards").path(0)
          .path("items_page").path("items")
        require(items.isArray && items.size() > 0, s"board $boardId has no items")
        s"board $boardId: ${items.size()} items"
      }
      gated("subitems") {
        val resp = client.apiCall(
          s"""query { boards(ids: [$boardId]) { items_page(limit: 100) {
             |  items { id subitems { id name } } } } }""".stripMargin)
        val items = resp.path("data").path("boards").path(0)
          .path("items_page").path("items")
        val nSubs = (0 until items.size())
          .map(i => items.path(i).path("subitems").size()).sum
        require(nSubs > 0, "no subitems extracted")
        s"$nSubs subitems"
      }
      // stage 4 never closes the gate: report-only, like the reference
      if (gateOpen) {
        val r =
          try {
            val pages = client.fetchAllPages(cur =>
              MondayQueries.itemsPageQuery(boardId, 100, cur))
            if (reload(pages)) StageResult("reload", ok = true,
              s"${pages.size} pages reloaded")
            else StageResult("reload", ok = false, "reload rejected the pages")
          } catch { case e: Throwable =>
            StageResult("reload", ok = false,
              Option(e.getMessage).getOrElse(e.getClass.getName))
          }
        results += r
      }
      results.result()
    }
  }

  /** CLI entry: runs the staged diagnosis over the canned fixture transport
    * (the same two-page projects board the src_* keys replay), printing one
    * PASS/FAIL line per stage. Exit 0 when every gating stage passed. */
  def main(args: Array[String]): Unit = {
    val root = graft.flatten.Flatten.fixtureRoot
    def page(p: String) =
      new String(Files.readAllBytes(Paths.get(s"$root/projects/$p")), "UTF-8")
    val p1 = page("2025-06-27_p1.json")
    val p2 = page("2025-06-27_p2.json")
    val transport = new Transport {
      def post(q: String): String = if (q.contains("cur-p2")) p2 else p1
    }
    val results = new Runner(new MondayClient(transport), "8113598675")
      .run(pages => pages.nonEmpty)
    results.foreach { r =>
      println(f"${if (r.ok) "PASS" else "FAIL"}%s  ${r.stage}%-8s ${r.detail}%s")
    }
    val gatingOk = results.filter(r => r.stage != "reload").forall(_.ok) &&
      results.size == Stages.size
    println(if (gatingOk) "diagnosis complete" else "diagnosis aborted")
    if (!gatingOk) sys.exit(1)
  }
}
