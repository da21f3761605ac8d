package graft.llm

import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{BpeModel, BpeSupport}

/** Property tests for the greedy BPE apply loop — the function every
  * text_tokenize_bpe / pack_sequences_bpe / text_chunk_bpe claim rests
  * on. Random words over a small alphabet with random ranked merge tables
  * exercise overlap and priority interactions far beyond the fixture's
  * vocabulary. Hand-rolled forAll: scalatestplus-scalacheck is not in the
  * offline cache. */
class TokenizeProps extends AnyFunSuite {

  private val genWord: Gen[String] = for {
    n <- Gen.chooseNum(0, 24)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd'))
  } yield cs.mkString

  private val genPair: Gen[(String, String)] = for {
    l <- Gen.chooseNum(1, 2).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    r <- Gen.chooseNum(1, 2).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
  } yield (l, r)

  private val genMerges: Gen[List[(String, String)]] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, genPair))
      .map(_.distinct)

  private def encode(word: String, merges: List[(String, String)]): List[String] = {
    val syms = new java.util.ArrayList[String]()
    BpeSupport.encodeWord(word, syms, new BpeModel(merges.toArray))
    val b = List.newBuilder[String]
    syms.forEach(t => b += t)
    b.result()
  }

  private def check(name: String, prop: Prop): Unit = {
    val params = Gen.Parameters.default
    (0 until 300).foreach { i =>
      val res = prop(params.withInitialSeed(Seed(i.toLong)))
      assert(res.success, s"$name failed at seed $i: $res")
    }
  }

  private val genCase = for {
    w <- genWord
    m <- genMerges
  } yield (w, m)

  test("tokens always reassemble the word exactly (lossless)") {
    check("lossless", Prop.forAll(genCase) { case (w, m) =>
      encode(w, m).mkString == w
    })
  }

  test("no adjacent token pair remaining in the merge table (fixpoint)") {
    check("fixpoint", Prop.forAll(genCase) { case (w, m) =>
      val toks = encode(w, m)
      val pairs = toks.zip(toks.drop(1))
      pairs.forall(p => !m.contains(p))
    })
  }

  test("encoding is deterministic and tokens are non-empty") {
    check("determinism", Prop.forAll(genCase) { case (w, m) =>
      val a = encode(w, m)
      val b = encode(w, m)
      a == b && a.forall(_.nonEmpty)
    })
  }

  test("a superset merge table never increases the token count") {
    check("monotone", Prop.forAll(genCase) { case (w, m) =>
      // appending LOWER-priority merges can only merge further (earlier
      // decisions are decided by the existing higher-priority prefix)
      val extra = List(("a", "b"), ("c", "d"), ("b", "c")).filterNot(m.contains)
      encode(w, m ++ extra).length <= encode(w, m).length
    })
  }

  /** Independent reference implementation of greedy BPE: repeatedly merge
    * the adjacent pair with the BEST (lowest) rank, leftmost on ties —
    * the textbook algorithm, written with none of the production code's
    * machinery so the two can only agree by computing the same thing. */
  private def referenceEncode(word: String,
      rank: Map[(String, String), Int]): List[String] = {
    var syms = word.map(_.toString).toList
    var done = syms.length < 2
    while (!done) {
      val ranked = syms.zip(syms.tail).zipWithIndex
        .flatMap { case (p, i) => rank.get(p).map(r => (r, i)) }
      if (ranked.isEmpty) done = true
      else {
        val (_, i) = ranked.min
        syms = syms.take(i) ::: (syms(i) + syms(i + 1)) :: syms.drop(i + 2)
        done = syms.length < 2
      }
    }
    syms
  }

  /** A GPT-class-SHAPED ranked table: ~1k distinct merges built
    * hierarchically — each new merge may pair symbols produced by earlier
    * merges, so high-rank entries are multi-character compositions,
    * exactly the structure a real trained 50k table has. Deterministic
    * per seed. */
  private def buildLargeTable(seed: Long, n: Int): List[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    val syms = scala.collection.mutable.ArrayBuffer("a", "b", "c", "d")
    val seen = scala.collection.mutable.Set.empty[(String, String)]
    val out = List.newBuilder[(String, String)]
    var guard = 0
    while (seen.size < n && guard < n * 40) {
      guard += 1
      val l = syms(rnd.nextInt(syms.length))
      val r = syms(rnd.nextInt(syms.length))
      if (l.length + r.length <= 12 && seen.add((l, r))) {
        out += ((l, r))
        syms += (l + r) // composed symbol available to later (lower) ranks
      }
    }
    out.result()
  }

  test("a ~1k-entry ranked table: apply loop matches the reference greedy algorithm") {
    // the claim at Tokenize.scala: the APPLY path takes any ranked
    // pair-merge table including a GPT-class one — proven here against an
    // independent implementation at 1000 entries, with long words so deep
    // hierarchical merges actually fire
    val genLongWord: Gen[String] = for {
      n <- Gen.chooseNum(0, 48)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield cs.mkString
    (0L until 8L).foreach { seed =>
      val table = buildLargeTable(seed, 1000)
      assert(table.size == 1000, s"seed $seed built only ${table.size} merges")
      val rank = table.zipWithIndex.toMap
      val deep = table.count { case (l, r) => (l + r).length >= 6 }
      assert(deep > 100, s"table not hierarchical enough: $deep deep merges")
      check(s"large-table seed $seed", Prop.forAll(genLongWord) { w =>
        val got = encode(w, table)
        val want = referenceEncode(w, rank)
        if (got != want) {
          info(s"mismatch on '$w': got $got want $want")
        }
        got == want
      })
    }
  }

  test("whole-document tokenization = per-word tokenization joined") {
    val genDoc = Gen.listOfN(6, genWord).map(_.mkString(" "))
    check("doc-composition", Prop.forAll(Gen.zip(genDoc, genMerges)) {
      case (doc, m) =>
        val model = new BpeModel(m.toArray)
        val whole = BpeSupport.tokenizeJoined(
          org.apache.spark.unsafe.types.UTF8String.fromString(doc), model)
          .toString
        val perWord = doc.split(" ").filter(_.nonEmpty)
          .map(w => encode(w, m).mkString("|")).mkString(" ")
        whole == perWord
    })
  }
}
