package graft.props

import org.scalacheck.{Gen, Prop, Properties}
import graft.operators.LshParams._

/** Pure-math properties of the LSH sizing calculator — no Spark, so
  * these run at full ScalaCheck case counts. The shipped-parameter
  * agreement checks (d2/d3/e2/e4 constants == calculator output) live
  * in LshParamsSpec beside the operators.
  */
object LshParamsProps extends Properties("LshParams") {

  private val tau = Gen.choose(0.05, 0.95)
  private val cos = Gen.choose(0.05, 0.95)

  property("minhash recall is monotone increasing in bands") =
    Prop.forAll(Gen.choose(1, 64), Gen.choose(1, 8), tau) { (b, r, t) =>
      minhashRecall(b + 1, r, t) >= minhashRecall(b, r, t)
    }

  property("minhash recall is monotone decreasing in rows (cost knob)") =
    Prop.forAll(Gen.choose(1, 64), Gen.choose(1, 8), tau) { (b, r, t) =>
      minhashRecall(b, r + 1, t) <= minhashRecall(b, r, t)
    }

  property("minhash midpoint decreases as bands increase") =
    Prop.forAll(Gen.choose(2, 64), Gen.choose(1, 8)) { (b, r) =>
      minhashMidpoint(b + 1, r) <= minhashMidpoint(b, r)
    }

  property("minhashBanding meets its target, or fails loudly iff infeasible") =
    Prop.forAll(Gen.oneOf(16, 32, 64, 128), tau) { (k, t) =>
      // r=1 (b=k) is the max-recall split; if even it misses the
      // target, the calculator must throw rather than ship a lossy
      // parameterization silently
      val feasible = minhashRecall(k, 1, t) >= 0.9
      try {
        val (b, r) = minhashBanding(k, t, targetRecall = 0.9)
        feasible && b * r == k && minhashRecall(b, r, t) >= 0.9
      } catch {
        case _: IllegalArgumentException => !feasible
      }
    }

  property("hyperplane recall is monotone increasing in tables") =
    Prop.forAll(Gen.choose(1, 64), Gen.choose(1, 16), cos) { (tb, bits, c) =>
      hyperplaneRecall(tb + 1, bits, c) >= hyperplaneRecall(tb, bits, c)
    }

  property("hyperplane recall (and candidate cost) fall as bits rise") =
    Prop.forAll(Gen.choose(1, 64), Gen.choose(1, 16), cos) { (tb, bits, c) =>
      hyperplaneRecall(tb, bits + 1, c) <= hyperplaneRecall(tb, bits, c)
    }

  property("hyperplaneTables output actually reaches the target") =
    Prop.forAll(Gen.choose(1, 12), Gen.choose(0.2, 0.9), Gen.oneOf(0.9, 0.99)) {
      (bits, c, target) =>
      val t = hyperplaneTables(bits, c, target)
      // minimality up to float slack in the ceil boundary
      t >= 1 && hyperplaneRecall(t, bits, c) >= target - 1e-12 &&
        (t == 1 || hyperplaneRecall(t - 1, bits, c) < target + 1e-9)
    }

  property("hyperplaneBits grows with corpus size (re-derive at deployed N)") =
    Prop.forAll(Gen.choose(64L, 1L << 40), Gen.choose(1L, 63L)) { (n, bkt) =>
      hyperplaneBits(2 * n, bkt) >= hyperplaneBits(n, bkt)
    }

  property("simhash pigeonhole: d differing bits never cover d+1 chunks") =
    Prop.forAll(Gen.choose(0, 8), Gen.listOfN(8, Gen.choose(0, 62))) {
      (d, flips) =>
      val chunks = simhashChunks(d)
      val bits = simhashChunkBits(63, d)
      // flip exactly d distinct bit positions; some chunk index in
      // [0, chunks) must contain none of them (bits past chunks*bits
      // belong to no chunk and only make collisions more likely)
      val used = flips.distinct.take(d).map(_ / bits).filter(_ < chunks).toSet
      used.size <= d && (0 until chunks).exists(k => !used.contains(k))
    }
}
