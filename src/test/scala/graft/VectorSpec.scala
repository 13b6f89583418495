package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.VectorOps

/** Pins the recall of the bucketed dedup_embedding kernel: the
  * sign-signature LSH + multi-probe candidate generation must find
  * exactly the pairs an exact all-pairs scan finds — including pairs
  * whose near-zero signature dims straddle zero (the case pure sign
  * bucketing misses, ADVICE r3).
  */
class VectorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def dot(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }

  /** exact all-pairs near-dup oracle, computed driver-side */
  private def exactPairs(rows: Seq[(Long, String, Seq[Double])])
      : Set[(Long, Long)] =
    (for {
      (ia, la, va) <- rows
      (ib, lb, vb) <- rows
      if ia < ib && la == lb
      sim = dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb)))
      if sim >= 0.999
    } yield (ia, ib)).toSet

  private def bucketedPairs(rows: Seq[(Long, String, Seq[Double])])
      : Set[(Long, Long)] = {
    val df: DataFrame = rows.toDF("vec_id", "label", "v")
    VectorOps.dedupEmbedding(df)
      .select($"da".cast("long"), $"db".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("dedup_embedding: multi-probe recovers pairs whose near-zero dims straddle zero") {
    val base = Seq(0.02, 0.8, -0.5, 0.3, -0.9, 0.6, 0.1, -0.4,
      0.7, 0.2, -0.3, 0.5)
    // near-identical twin, but dim 0 (|v|=0.02 < eps) flips sign →
    // DIFFERENT primary sign bucket; only multi-probe can pair them
    val twin = Seq(-0.02, 0.8, -0.5, 0.3, -0.9, 0.6, 0.1, -0.4,
      0.7, 0.2, -0.3, 0.5)
    // a pair that straddles zero on TWO near-zero dims (0 and 6)
    val base2 = base.updated(6, 0.01)
    val twin2 = twin.updated(6, -0.01)
    // same-bucket near-dups (the easy case) and an unrelated far vector
    val far = Seq(0.9, -0.8, 0.7, -0.6, 0.5, -0.4, 0.3, -0.2,
      0.1, -0.9, 0.8, -0.7)
    val rows: Seq[(Long, String, Seq[Double])] = Seq(
      (1L, "a", base), (2L, "a", twin),
      (3L, "a", base2), (4L, "a", twin2),
      (5L, "a", base.map(_ * 1.0001)), // same bucket as base
      (6L, "a", far),
      (7L, "b", base)) // right vector, wrong label — must NOT pair
    val exact = exactPairs(rows)
    val got = bucketedPairs(rows)
    // sanity: the fixture actually exercises the straddle case
    assert(exact.contains((1L, 2L)), "fixture: straddle pair must be a true near-dup")
    assert(exact.contains((3L, 4L)), "fixture: double-straddle pair must be a true near-dup")
    assert(!exact.exists { case (x, y) => x == 7L || y == 7L })
    assert(got == exact,
      s"bucketed recall != exact: missing=${exact -- got} extra=${got -- exact}")
  }

  test("dedup_embedding: exact parity on random vectors with planted dups") {
    val rnd = new scala.util.Random(42)
    val random: Seq[(Long, String, Seq[Double])] = (1L to 60L).map { i =>
      (i, if (i % 2 == 0) "x" else "y",
        Seq.fill(12)(rnd.nextDouble() * 2 - 1))
    }
    // planted near-dups: tiny scalar perturbations of the first 10
    val planted = (61L to 70L).map { i =>
      val (_, slabel, sv) = random((i - 61).toInt)
      (i, slabel, sv.map(_ * (1.0 + 1e-5)))
    }
    val rows = random ++ planted
    assert(bucketedPairs(rows) == exactPairs(rows))
  }

  test("v_knn_graph: beam search over the proximity graph — shape, " +
      "determinism, and recall@5 >= 0.7 vs brute force") {
    val dir = "/root/testdata/sf0.001"
    val graphDf = VectorOps.defs("v_knn_graph")(spark, dir)
    val rows = graphDf.collect()
    // 20 query vectors, exactly 5 ranked neighbors each, never self
    assert(rows.length == 100, s"expected 20x5 rows, got ${rows.length}")
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 20)
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 5L),
        s"qid=$qid ranks not 1..5")
      assert(!rs.exists(_.getLong(2) == qid), s"qid=$qid returned itself")
      val sims = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"qid=$qid sims not descending")
    }
    // recall@5 against the exact brute-force top-5 (the graph walk
    // scores ~112 of 500 candidates; per-cell seeding is what holds
    // recall on distance-concentrated uniform vectors)
    val brute = VectorOps.defs("v_knn_brute")(spark, dir).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val got = byQ.view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val recall = brute.keys.toSeq
      .map(q => (brute(q) & got.getOrElse(q, Set.empty)).size / 5.0)
      .sum / brute.size
    assert(recall >= 0.7, s"recall@5 $recall < 0.7")
    // deterministic: a second build returns the identical ranking
    val again = VectorOps.defs("v_knn_graph")(spark, dir).collect()
    assert(again.map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq)
  }

  test("v_knn_bq: packed hamming == dim-wise sign disagreement; " +
      "rescore recall@5 >= 0.6") {
    val dir = "/root/testdata/sf0.001"
    val rows = VectorOps.defs("v_knn_bq")(spark, dir).collect()
    assert(rows.nonEmpty)
    // packing property: the reported hamming (xor+popcount over two
    // 32-bit halves) equals the disagreement count of the sign
    // vectors, recomputed here from the raw floats
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_ > 0f)).toMap
    rows.foreach { r =>
      val (qid, nid, ham) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val expect = vecs(qid).zip(vecs(nid)).count { case (a, b) => a != b }
      assert(ham == expect, s"($qid,$nid): hamming $ham != $expect")
    }
    // 1-bit codes + C=50 exact rescore hold recall on the
    // distance-concentrated uniform corpus (measured 0.71)
    val brute = VectorOps.defs("v_knn_brute")(spark, dir).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val got = rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val recall = brute.keys.toSeq
      .map(q => (brute(q) & got.getOrElse(q, Set.empty)).size / 5.0)
      .sum / brute.size
    assert(recall >= 0.6, s"recall@5 $recall < 0.6")
  }
}
