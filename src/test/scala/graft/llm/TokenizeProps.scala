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
