package graft

import scala.util.Random

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized fuzz of the native BPE greedy-loop encoder against an
  * independently-written reference, over random MERGE TABLES — BpeSpec's
  * corpus fuzz varies the text but trains real merges; random tables reach
  * degenerate rank structures (chained merges, shadowed pairs, merges whose
  * application re-creates lower-rank pairs) no trained table produces.
  * Evaluated driver-side through the expression's own eval bridge, so the
  * exact production code path runs without a Spark job per case.
  */
class BpeFuzzSpec extends AnyFunSuite {

  private val seed = sys.props.get("graft.fuzz.seed").map(_.toLong).getOrElse(20260815L)

  /** Independent greedy reference (same contract as BpeSpec.refEncode):
    * repeatedly find the lowest-rank adjacent pair anywhere in the word and
    * merge its non-overlapping occurrences left to right.
    */
  private def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.toCharArray.map(_.toString).toSeq
    var continue = syms.size >= 2
    while (continue) {
      val present = syms.zip(syms.drop(1)).flatMap(rank.get)
      if (present.isEmpty) continue = false
      else {
        val (a, b) = merges(present.min)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.size) {
          if (i < syms.size - 1 && syms(i) == a && syms(i + 1) == b) { out += a + b; i += 2 }
          else { out += syms(i); i += 1 }
        }
        syms = out.toSeq
        continue = syms.size >= 2
      }
    }
    syms
  }

  /** Production path: the BpeSubwords Catalyst expression, eval'd directly. */
  private def nativeEncode(text: String, merges: Seq[(String, String)]): Seq[Seq[String]] = {
    val out = graft.plans.BpeSubwords(Literal.create(text,
      org.apache.spark.sql.types.StringType), merges).eval(null)
    val arr = out.asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val w = arr.getArray(i)
      (0 until w.numElements()).map(j => w.getUTF8String(j).toString).toSeq
    }.toSeq
  }

  /** Random merge table over a tiny alphabet: pairs drawn from a growing
    * pool (alphabet + products of earlier merges), so deep chains and
    * re-creatable pairs occur constantly; duplicates removed (a duplicate
    * pair's effective rank is ambiguous between implementations by
    * construction, not a semantics difference).
    */
  private def genMerges(rnd: Random, alphabet: Seq[String]): Seq[(String, String)] = {
    val pool = scala.collection.mutable.ArrayBuffer[String](alphabet: _*)
    val seen = scala.collection.mutable.Set.empty[(String, String)]
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    (0 until 2 + rnd.nextInt(12)).foreach { _ =>
      val pair = (pool(rnd.nextInt(pool.length)), pool(rnd.nextInt(pool.length)))
      if (seen.add(pair)) {
        merges += pair
        pool += pair._1 + pair._2
      }
    }
    merges.toSeq
  }

  test(s"native BPE equals the greedy reference over 3000 random tables [seed=$seed]") {
    info(s"graft.fuzz.seed=$seed")
    val rnd = new Random(seed)
    val alphabet = Seq("a", "b", "c", "d")
    (0 until 3000).foreach { i =>
      val merges = genMerges(rnd, alphabet)
      val nWords = 1 + rnd.nextInt(3)
      val text = (0 until nWords).map { _ =>
        val len = rnd.nextInt(24)
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }.mkString(" ")
      val got = nativeEncode(text, merges)
      val want = text.split(" ", -1).toSeq.map(w => refEncode(w, merges))
      assert(got == want,
        s"case $i (seed=$seed): text='$text' merges=$merges\n got=$got\nwant=$want")
      // invariant: concatenating subwords always rebuilds the word exactly
      assert(got.map(_.mkString) == text.split(" ", -1).toSeq,
        s"case $i (seed=$seed): lossy encode on '$text' with $merges")
    }
  }
}
